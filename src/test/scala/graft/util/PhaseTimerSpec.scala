package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** PhaseTimer backs the committed metadata-plane breakdown
  * (BENCH_META e2e_breakdown) — its accumulation semantics are record
  * evidence, so they are pinned: seconds and call counts accumulate per
  * name, exceptions still record (the orchestrator's phases can throw),
  * and reset clears everything.
  */
class PhaseTimerSpec extends AnyFunSuite {

  test("accumulates seconds and call counts per name; reset clears") {
    PhaseTimer.reset()
    PhaseTimer.time("a") { Thread.sleep(5) }
    PhaseTimer.time("a") { Thread.sleep(5) }
    PhaseTimer.time("b") { () }
    val snap = PhaseTimer.snapshot()
    assert(snap("a")._2 == 2)
    assert(snap("a")._1 >= 0.008, s"expected >=8ms accumulated, got ${snap("a")._1}")
    assert(snap("b")._2 == 1)
    PhaseTimer.reset()
    assert(PhaseTimer.snapshot().isEmpty)
  }

  test("a throwing phase still records its time") {
    PhaseTimer.reset()
    intercept[RuntimeException] {
      PhaseTimer.time("boom") { Thread.sleep(3); throw new RuntimeException("x") }
    }
    val snap = PhaseTimer.snapshot()
    assert(snap("boom")._2 == 1 && snap("boom")._1 > 0.0)
    PhaseTimer.reset()
  }

  test("concurrent adds from parallel workers do not lose counts") {
    PhaseTimer.reset()
    val threads = (1 to 8).map(_ => new Thread(() =>
      (1 to 100).foreach(_ => PhaseTimer.add("par", 1000000L))))
    threads.foreach(_.start()); threads.foreach(_.join())
    val (sec, n) = PhaseTimer.snapshot()("par")
    assert(n == 800)
    assert(math.abs(sec - 0.8) < 1e-9)
    PhaseTimer.reset()
  }
}
