package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class SequenceSaverSpec extends AnyFunSuite {

  test("in-memory saver: get/set/del round-trip (sequence.go:20-24 contract)") {
    val s = new InMemorySequenceSaver
    assert(s.get("st", "shard-0").isEmpty)
    s.set("st", "shard-0", "42")
    assert(s.get("st", "shard-0").contains("42"))
    s.set("st", "shard-0", "43")
    assert(s.get("st", "shard-0").contains("43"))
    s.del("st", "shard-0")
    assert(s.get("st", "shard-0").isEmpty)
    // keys are (stream, shard) scoped
    s.set("st", "shard-1", "7")
    s.set("other", "shard-1", "9")
    assert(s.get("st", "shard-1").contains("7"))
    assert(s.get("other", "shard-1").contains("9"))
  }

  test("file saver: durable across instances, atomic overwrite") {
    val dir = Files.createTempDirectory("saver").toString
    val a = new FileSequenceSaver(dir)
    a.set("st", "shardId-000000001", "100")
    val b = new FileSequenceSaver(dir)
    assert(b.get("st", "shardId-000000001").contains("100"))
    b.set("st", "shardId-000000001", "101")
    assert(a.get("st", "shardId-000000001").contains("101"))
    b.del("st", "shardId-000000001")
    assert(a.get("st", "shardId-000000001").isEmpty)
  }

  class FlakySaver(failures: Int) extends SequenceSaver {
    val inner = new InMemorySequenceSaver
    var remaining: Int = failures
    var attempts: Int = 0
    private def maybeFail(): Unit = {
      attempts += 1
      if (remaining > 0) { remaining -= 1; throw new RuntimeException("saver down") }
    }
    def get(st: String, sh: String): Option[String] = { maybeFail(); inner.get(st, sh) }
    def set(st: String, sh: String, sq: String): Unit = { maybeFail(); inner.set(st, sh, sq) }
    def del(st: String, sh: String): Unit = { maybeFail(); inner.del(st, sh) }
  }

  test("retrying saver succeeds within budget (sequence.go:55-72, reTry=3)") {
    val flaky = new FlakySaver(failures = 2)
    val r = new RetryingSaver(flaky, retries = 3)
    r.set("st", "s0", "5")
    assert(flaky.attempts == 3)
    assert(flaky.inner.get("st", "s0").contains("5"))
  }

  test("retrying saver surfaces exhaustion (fixes the reference's shadowed-err bug, sequence.go:63-71)") {
    val flaky = new FlakySaver(failures = 5)
    val r = new RetryingSaver(flaky, retries = 3)
    val e = intercept[RuntimeException] { r.set("st", "s0", "5") }
    assert(e.getMessage == "saver down")
    assert(flaky.attempts == 3)
    assert(flaky.inner.get("st", "s0").isEmpty)
  }
}
