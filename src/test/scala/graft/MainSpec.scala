package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {

  test("go-back parses d-m-y and d/m/y (P12)") {
    assert(Main.parseGoBack("01-01-2020") == Instant.parse("2020-01-01T00:00:00Z"))
    assert(Main.parseGoBack("15/6/2021") == Instant.parse("2021-06-15T00:00:00Z"))
    intercept[IllegalArgumentException](Main.parseGoBack("2020-01"))
  }

  test("arg parsing and required-arg validation (P11)") {
    val o = Main.parseArgs(Seq("-s", "src", "-m", "mir", "-c", "ck", "-t", "tbl",
      "--continuous", "--go-back", "01-01-2020", "--creation-time", "todatetime(p0)"))
    assert(o.source == "src" && o.specs.head.mirror == "mir" && o.checkpoint == "ck")
    assert(o.table == "tbl" && o.continuous)
    assert(o.goBack.contains(Instant.parse("2020-01-01T00:00:00Z")))
    assert(o.creationTime.contains("todatetime(p0)"))

    val o2 = Main.parseArgs(Seq("-s", "s", "-m", "m", "-c", "c",
      "--optimize-every", "20", "--optimize-small-files", "64"))
    assert(o2.optimizeEvery.contains(20) && o2.optimizeSmallFiles.contains(64))

    intercept[IllegalArgumentException](Main.parseArgs(Seq("-s", "src")))
    intercept[IllegalArgumentException](Main.parseArgs(Seq("-s", "src", "-m", "m", "-c", "c", "--bogus")))
  }

  test("single-table flag order stays free (-m/-t before -s)") {
    val o = Main.parseArgs(Seq("-t", "tbl", "-m", "mir", "-s", "src", "-c", "ck"))
    assert(o.specs == Vector(Main.TableSpec("src", "mir", "tbl")))
  }

  test("repeated -s/-m/-t declares additional tables sharing one checkpoint") {
    val o = Main.parseArgs(Seq(
      "-s", "srcA", "-m", "mirA", "-t", "ta",
      "-s", "srcB", "-m", "mirB", "-t", "tb",
      "-c", "ck"))
    assert(o.specs.map(s => (s.source, s.mirror, s.table)) ==
      Vector(("srcA", "mirA", "ta"), ("srcB", "mirB", "tb")))
    assert(o.checkpoint == "ck")

    // second table missing its mirror URL
    intercept[IllegalArgumentException](Main.parseArgs(Seq(
      "-s", "srcA", "-m", "mirA", "-s", "srcB", "-c", "ck")))
    // duplicate table names (both default "mirror")
    intercept[IllegalArgumentException](Main.parseArgs(Seq(
      "-s", "srcA", "-m", "mirA", "-s", "srcB", "-m", "mirB", "-c", "ck")))
  }
}
