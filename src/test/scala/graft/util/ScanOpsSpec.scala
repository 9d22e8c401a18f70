package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ScanOps.cumSum: the two-pass distributed scan must equal the sequential
  * running sum on every partition layout, stay exact in Long, and fail loud
  * on overflow instead of wrapping.
  */
class ScanOpsSpec extends SparkSuite {

  import spark.implicits._

  test("matches the sequential running sum across partition layouts") {
    val vals = (1L to 1000L).map(i => (i, i % 7))
    val want = vals.map(_._2).scanLeft(0L)(_ + _).tail
    for (parts <- Seq(1, 3, 32)) {
      val df = vals.toDF("k", "v").repartition(parts).sortWithinPartitions("k")
        .orderBy("k") // global order
      val got = ScanOps.cumSum(df, "v", "cum")
        .orderBy("k").select("cum").as[Long].collect().toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("fractional input accumulates in double; nulls contribute zero") {
    val df = Seq[(Long, java.lang.Double)]((1L, 1.5), (2L, null), (3L, 2.5))
      .toDF("k", "v").orderBy("k")
    val got = ScanOps.cumSum(df, "v", "cum").orderBy("k")
      .select("cum").as[Double].collect().toSeq
    assert(got == Seq(1.5, 1.5, 4.0))
  }

  test("lag1/lead1 match the sequential shift across partition layouts, empty partitions included") {
    val vals = (1L to 100L).map(i => (i, s"v$i"))
    for (parts <- Seq(1, 7, 64)) { // 64 partitions on 100 rows → some empty/thin
      val df = vals.toDF("k", "v").repartition(parts).orderBy("k")
      val got = ScanOps.lead1(ScanOps.lag1(df, "v", "p"), "v", "n")
        .orderBy("k").select("k", "p", "n").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      got.foreach { case (k, p, n) =>
        assert(p == (if (k == 1) None else Some(s"v${k - 1}")), s"parts=$parts k=$k prev")
        assert(n == (if (k == 100) None else Some(s"v${k + 1}")), s"parts=$parts k=$k next")
      }
    }
  }

  test("long overflow fails loud (addExact), never wraps silently") {
    val df = Seq(Long.MaxValue, 1L).toDF("v")
    // executor-side overflow arrives wrapped in SparkException; the
    // driver-side offset fold throws ArithmeticException directly
    val e = intercept[Exception] {
      ScanOps.cumSum(df, "v", "cum").collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("overflow")) || mentions(t.getCause))
    assert(mentions(e), s"unexpected: $e")
  }

  test("distSinceTrue/distToNextTrue match the sequential scan across layouts") {
    val flags = Seq(false, false, true, false, false, false, true, false, false)
    val vals  = flags.zipWithIndex.map { case (f, i) => (i.toLong, f) }
    // sequential references: null before first TRUE / after last TRUE
    val wantSince = Seq(null, null, 0L, 1L, 2L, 3L, 0L, 1L, 2L)
    val wantNext  = Seq(2L, 1L, 0L, 3L, 2L, 1L, 0L, null, null)
    for (parts <- Seq(1, 4, 16)) {
      val df = vals.toDF("k", "c").repartition(parts).orderBy("k")
      val got = ScanOps.distToNextTrue(
        ScanOps.distSinceTrue(df, "c", "ds"), "c", "dn")
        .orderBy("k").collect()
      assert(got.map(r => if (r.isNullAt(2)) null else r.getLong(2)).toSeq ==
        wantSince, s"since parts=$parts")
      assert(got.map(r => if (r.isNullAt(3)) null else r.getLong(3)).toSeq ==
        wantNext, s"next parts=$parts")
    }
  }
}
