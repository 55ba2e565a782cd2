package graft.tools

import graft.sources.kinesis.AwsKinesisClient

/** Real-SDK smoke main for the reflective AWS adapter (r15 VERDICT
  * item 8) — launched by tools/real_sdk_smoke.sh with an actual AWS
  * SDK v2 jar set on the classpath (the one surface the zero-egress
  * sandbox cannot test; AwsKinesisClientSpec's mutation matrix is the
  * offline ceiling).
  *
  * Stage 1 — structural: run [[AwsKinesisClient.validate]] against the
  * loaded classpath and print every problem verbatim (the same
  * strings the mutation matrix asserts on). Empty list = the real SDK
  * satisfies the full reflective surface.
  *
  * Stage 2 — live (optional, args = streamName region): configure()
  * then listShards() — one read-only ListShards round trip; requires
  * credentials in the standard chain. No records are consumed.
  */
object RealSdkSmoke {
  def main(args: Array[String]): Unit = {
    val client = new AwsKinesisClient
    val problems = client.validate()
    if (problems.nonEmpty) {
      System.err.println(s"REAL_SDK_VALIDATE: FAIL (${problems.size} problems)")
      problems.foreach(p => System.err.println(s"  $p"))
      sys.exit(1)
    }
    println("REAL_SDK_VALIDATE: PASS (0 problems — full reflective surface bound)")

    val stream = args.headOption.filter(_.nonEmpty)
    stream match {
      case None =>
        println("REAL_SDK_LIVE: skipped (no streamName argument)")
      case Some(name) =>
        val region = args.lift(1).getOrElse("us-east-1")
        client.configure(Map("region" -> region))
        val shards = client.listShards(name)
        println(s"REAL_SDK_LIVE: ListShards('$name') -> ${shards.size} shard(s)")
        shards.take(5).foreach(s => println(s"  $s"))
        if (shards.isEmpty) {
          System.err.println("REAL_SDK_LIVE: FAIL (stream has no shards?)")
          sys.exit(2)
        }
    }
  }
}
