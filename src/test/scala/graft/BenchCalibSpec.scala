package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Bench.calibWarning against a synthetic committed band — the warning must
  * fire only when a START probe exceeds the band by >25%, resolve the NEWEST
  * record numerically (r10 > r9), and stay silent on a fresh checkout.
  */
class BenchCalibSpec extends AnyFunSuite {

  private def dirWith(files: (String, String)*): java.io.File = {
    val d = Files.createTempDirectory("calib").toFile
    files.foreach { case (name, content) =>
      Files.write(d.toPath.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    }
    d
  }

  private def rec(s1: Double, sN: Double): String =
    s"""{"queries":{},"calib":{"s1":$s1,"sN":$sN,"e1":$s1,"eN":$sN,"threads":32},"metric":"total","value":1.0}"""

  test("warns only past 1.25x of the newest committed band") {
    val d = dirWith(
      "BENCH_LOCAL_r09.json" -> rec(10.0, 10.0), // stale — must NOT win
      "BENCH_LOCAL_r10.json" -> rec(0.6, 0.65))
    assert(Bench.calibWarning(0.7, 0.7, Seq(d)).isEmpty, "in-band must not warn")
    val w = Bench.calibWarning(0.9, 0.65, Seq(d))
    assert(w.isDefined && w.get.contains("BENCH_LOCAL_r10.json"), s"got $w")
    assert(Bench.calibWarning(0.6, 0.9, Seq(d)).isDefined, "sN breach must warn too")
  }

  test("numeric round order: r100 beats r99") {
    val d = dirWith(
      "BENCH_LOCAL_r99.json"  -> rec(0.1, 0.1),  // would warn on anything
      "BENCH_LOCAL_r100.json" -> rec(5.0, 5.0))  // generous band
    assert(Bench.calibWarning(0.6, 0.6, Seq(d)).isEmpty,
      "lexicographic pick of r99 would have warned")
  }

  test("silent on a fresh checkout and on unparseable records") {
    val empty = dirWith()
    assert(Bench.calibWarning(99.0, 99.0, Seq(empty)).isEmpty)
    val torn = dirWith("BENCH_LOCAL_r01.json" -> "{not json")
    assert(Bench.calibWarning(99.0, 99.0, Seq(torn)).isEmpty)
  }

  test("falls through to the next candidate dir when the first has no records") {
    val empty = dirWith()
    val band  = dirWith("BENCH_LOCAL_r01.json" -> rec(0.6, 0.6))
    assert(Bench.calibWarning(0.9, 0.9, Seq(empty, band)).isDefined,
      "band in the second candidate dir must be found")
  }
}
