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

  test("nested time attributes to the innermost label only: sum(phases) <= wall (r16 verdict #5)") {
    PhaseTimer.reset()
    val t0 = System.nanoTime()
    PhaseTimer.time("outer") {
      Thread.sleep(10)
      PhaseTimer.time("inner") { Thread.sleep(20) }
      PhaseTimer.time("inner") { Thread.sleep(20) }
      Thread.sleep(10)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val snap = PhaseTimer.snapshot()
    val (outerSec, outerCalls) = snap("outer")
    val (innerSec, innerCalls) = snap("inner")
    assert(outerCalls == 1 && innerCalls == 2)
    // inner gets its own ~40ms; outer gets ONLY its ~20ms residual
    assert(innerSec >= 0.035, s"inner under-attributed: $innerSec")
    assert(outerSec >= 0.015, s"outer residual lost: $outerSec")
    assert(outerSec < innerSec, s"outer still includes inner: outer=$outerSec inner=$innerSec")
    // the pinned contract: same-thread phases are DISJOINT
    assert(outerSec + innerSec <= wall + 1e-3,
      s"sum(phases) ${outerSec + innerSec} exceeds wall $wall")
    PhaseTimer.reset()
  }

  test("deeper nests subtract the whole child span from the direct parent only") {
    PhaseTimer.reset()
    PhaseTimer.time("a") {
      PhaseTimer.time("b") {
        PhaseTimer.time("c") { Thread.sleep(15) }
      }
      Thread.sleep(5)
    }
    val snap = PhaseTimer.snapshot()
    // c owns the sleep; b is a thin wrapper (~0); a owns only its 5ms tail
    assert(snap("c")._1 >= 0.012, s"c: ${snap("c")._1}")
    assert(snap("b")._1 < 0.010, s"b should be near-zero self time: ${snap("b")._1}")
    assert(snap("a")._1 < snap("c")._1, s"a=${snap("a")._1} c=${snap("c")._1}")
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
