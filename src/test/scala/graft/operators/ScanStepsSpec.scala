package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.SparkSuite

/** ScanSteps (the restricted KQL `scan`) against an in-memory reference
  * fold and, for two steps, the window/lag closed form the DuckDB oracle
  * uses — on RANDOM event sequences, so partition boundaries, key
  * interleavings and step orders all get exercised.
  */
class ScanStepsSpec extends SparkSuite {

  import spark.implicits._

  /** Reference single-instance state machine, sequentially per key. */
  private def referenceFold(rows: Seq[(Long, Long, String)], steps: Seq[String])
      : Set[Seq[Long]] = {
    val n   = steps.size
    val out = Set.newBuilder[Seq[Long]]
    rows.groupBy(_._1).foreach { case (_, evs) =>
      val state = Array.fill[Option[Long]](n)(None)
      evs.sortBy(_._2).foreach { case (u, t, e) =>
        val i = (n - 1 to 0 by -1).find(j =>
          steps(j) == e && (j == 0 || state(j - 1).isDefined))
        i.foreach {
          case j if j == n - 1 =>
            out += ((0 until n - 1).map(state(_).get) :+ t).+:(u)
            state.indices.foreach(state(_) = None)
          case j =>
            state(j) = Some(t)
            ((j + 1) until n).foreach(state(_) = None)
        }
      }
    }
    out.result()
  }

  private def runScan(rows: Seq[(Long, Long, String)], steps: Seq[String]): Set[Seq[Long]] = {
    val df = rows.toDF("u", "t", "e")
    val res = ScanSteps.scanSteps(df, Seq("u"), "t", ascending = true,
      steps.zipWithIndex.map { case (s, i) => (s"s$i", col("e") === s) })
    res.select((col("u") +: steps.indices.map(i => col(s"s${i}_t"))): _*)
      .collect().map(r => (0 to steps.size).map(r.getLong)).toSet
  }

  private def eventsGen(types: Seq[String]): Gen[Seq[(Long, Long, String)]] =
    Gen.listOf(for {
      u <- Gen.choose(1L, 4L)
      e <- Gen.oneOf(types)
    } yield (u, e)).map(_.zipWithIndex.map { case ((u, e), i) => (u, i.toLong, e) })
    // ts = arrival index: unique, so the order is total and deterministic

  test("property: distributed scan equals the sequential reference fold (2 and 3 steps)") {
    for (steps <- Seq(Seq("A", "B"), Seq("A", "B", "C"))) {
      val prop = Prop.forAll(eventsGen(steps ++ Seq("X"))) { rows =>
        runScan(rows, steps) == referenceFold(rows, steps)
      }
      val res = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
      assert(res.passed, s"$steps: ${res.status}")
    }
  }

  test("property: declared state variables equal the sequential reference fold") {
    import org.apache.spark.sql.types.LongType
    import ScanSteps.{ScanOutput, ScanStepDef, ScanUpdate, ScanVarDef}
    // cnt: +1 per A-match; vsum: +v on A and completing B; vmax: max v over
    // A-matches — all reset at completion (NOT at an A restart)
    def reference(rows: Seq[(Long, Long, String, Long)])
        : Set[(Long, Long, Long, Long, Long, Long)] = {
      val out = Set.newBuilder[(Long, Long, Long, Long, Long, Long)]
      rows.groupBy(_._1).foreach { case (u, evs) =>
        var a: Option[Long] = None
        var cnt = 0L; var vsum = 0L; var vmax = 0L
        evs.sortBy(_._2).foreach { case (_, t, e, v) =>
          if (e == "B" && a.isDefined) {
            vsum += v
            out += ((u, a.get, t, cnt, vsum, vmax))
            a = None; cnt = 0L; vsum = 0L; vmax = 0L
          } else if (e == "A") {
            cnt += 1; vsum += v; vmax = math.max(vmax, v); a = Some(t)
          }
        }
      }
      out.result()
    }
    val gen = Gen.listOf(for {
      u <- Gen.choose(1L, 4L)
      e <- Gen.oneOf(Seq("A", "B", "X"))
      v <- Gen.choose(0L, 9L)
    } yield (u, e, v)).map(_.zipWithIndex.map { case ((u, e, v), i) => (u, i.toLong, e, v) })
    val prop = Prop.forAll(gen) { rows =>
      val df = rows.toDF("u", "t", "e", "v")
      val res = ScanSteps.scanDeclare(df, Seq("u"), "t", ascending = true,
        Seq(ScanVarDef("cnt", LongType, 0L), ScanVarDef("vsum", LongType, 0L),
          ScanVarDef("vmax", LongType, 0L)),
        Seq(
          ScanStepDef("sa", col("e") === "A", Seq(
            "cnt" -> ScanUpdate.Add(lit(1)),
            "vsum" -> ScanUpdate.Add(col("v")),
            "vmax" -> ScanUpdate.MaxOf(col("v"))), ScanOutput.Silent),
          ScanStepDef("sb", col("e") === "B", Seq(
            "vsum" -> ScanUpdate.Add(col("v"))))))
      val got = res.select("u", "sa_t", "sb_t", "cnt", "vsum", "vmax").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      got == reference(rows)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: output=all + with_match_id equals the sequential reference") {
    import ScanSteps.ScanStepDef
    // reference: every A row emits (ordinal id); a B with a pending A
    // completes under the A's id; -1 encodes the null sb_t of A rows
    def reference(rows: Seq[(Long, Long, String)]): Set[(Long, Long, Long, Long)] = {
      val out = Set.newBuilder[(Long, Long, Long, Long)]
      rows.groupBy(_._1).foreach { case (u, evs) =>
        var a: Option[Long] = None
        var nextId = 0L; var cur = 0L
        evs.sortBy(_._2).foreach { case (_, t, e) =>
          if (e == "B" && a.isDefined) { out += ((u, a.get, t, cur)); a = None }
          else if (e == "A") {
            cur = nextId; nextId += 1; a = Some(t); out += ((u, t, -1L, cur))
          }
        }
      }
      out.result()
    }
    val prop = Prop.forAll(eventsGen(Seq("A", "B", "X"))) { rows =>
      val df = rows.toDF("u", "t", "e")
      val res = ScanSteps.scanDeclare(df, Seq("u"), "t", ascending = true, Nil,
        Seq(ScanStepDef("sa", col("e") === "A"), ScanStepDef("sb", col("e") === "B")),
        matchId = Some("mid"))
      val got = res.select("u", "sa_t", "sb_t", "mid").collect().map(r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getLong(3))).toSet
      got == reference(rows)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: two-step scan equals the window/lag closed form") {
    // each B whose latest preceding A is newer than the previous B row,
    // attributed to that latest A — what q_kql_scan_funnel's oracle asserts
    val prop = Prop.forAll(eventsGen(Seq("A", "B"))) { rows =>
      val closed = rows.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
        val sorted = evs.sortBy(_._2)
        val bs = sorted.filter(_._3 == "B").map(_._2)
        val prevBs = if (bs.isEmpty) Nil else None +: bs.init.map(Some(_))
        bs.zip(prevBs).flatMap { case (b, prevB) =>
          val lastA = sorted.filter(e => e._3 == "A" && e._2 < b).map(_._2).maxOption
          lastA.filter(a => prevB.forall(a > _)).map(a => Seq(u, a, b))
        }
      }.toSet
      runScan(rows, Seq("A", "B")) == closed
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
