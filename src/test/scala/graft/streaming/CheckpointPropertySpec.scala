package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests from the SURVEY §5 plan: checkpoint
  * monotonicity (stored sequence never regresses) and saver-retry
  * equivalence under injected failures. Randomized over seeded cases
  * (deterministic — no scalacheck/scalatest bridge in the offline
  * dependency set).
  */
class CheckpointPropertySpec extends AnyFunSuite {

  private def pad(n: Long): String = f"$n%021d"

  test("stored sequence never regresses under arbitrary batch splits") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val nRecords = 1 + rnd.nextInt(200)
      val saver = new InMemorySequenceSaver
      val seqs = (1L to nRecords.toLong).map(pad)
      var i = 0
      var lastStored = ""
      while (i < seqs.length) {
        val size = 1 + rnd.nextInt(10)
        val batch = seqs.slice(i, i + size)
        i += size
        if (batch.nonEmpty) {
          // both the consumer and the source commit the batch max
          saver.set("st", "s0", batch.max)
          val stored = saver.get("st", "s0").get
          assert(stored >= lastStored, s"checkpoint regressed: $lastStored -> $stored")
          lastStored = stored
        }
      }
      assert(saver.get("st", "s0").contains(pad(nRecords.toLong)))
    }
  }

  test("sequence order equals numeric order under arbitrary zero padding") {
    val rnd = new scala.util.Random(2026)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong(1000000L)
      val b = rnd.nextLong(1000000L)
      val padA = "0" * rnd.nextInt(6) + a.toString
      val padB = "0" * rnd.nextInt(6) + b.toString
      assert(graft.sources.kinesis.SequenceOrder.leq(padA, padB) == (a <= b),
        s"leq($padA, $padB) disagrees with $a <= $b")
    }
  }

  test("retrying saver reaches the same final state as a perfect saver under transient failures") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val inner = new InMemorySequenceSaver
      // failure plan: for each op, how many times it fails before
      // succeeding (always < the retry budget of 3)
      var plan = List.fill(20)(rnd.nextInt(3))
      val flaky = new SequenceSaver {
        private def maybeFail(): Unit = plan match {
          case n :: rest if n > 0 => plan = (n - 1) :: rest; throw new RuntimeException("down")
          case _ :: rest => plan = rest
          case Nil =>
        }
        def get(st: String, sh: String): Option[String] = { maybeFail(); inner.get(st, sh) }
        def set(st: String, sh: String, sq: String): Unit = { maybeFail(); inner.set(st, sh, sq) }
        def del(st: String, sh: String): Unit = { maybeFail(); inner.del(st, sh) }
      }
      val r = new RetryingSaver(flaky, retries = 3)
      (1 to 10).foreach(i => r.set("st", "s0", pad(i.toLong)))
      assert(inner.get("st", "s0").contains(pad(10L)))
    }
  }
}
