package graft.operators

import graft.SparkSuite

/** RangeJoin.pointInInterval: bucketed equi-join semantics must equal the
  * brute-force non-equi join on every bucket/boundary alignment, and the
  * physical plan must never contain a nested-loop/cartesian join.
  */
class RangeJoinSpec extends SparkSuite {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0L), (2L, 9L), (3L, 10L), (4L, 15L), (5L, 29L), (6L, 30L), (7L, 100L)
  ).toDF("pid", "t")

  private lazy val intervals = Seq(
    (10L, 0L, 10L),   // aligned to one bucket (width 10)
    (20L, 5L, 25L),   // spans three buckets
    (30L, 29L, 31L),  // crosses a bucket boundary
    (40L, 50L, 50L),  // empty (end == start) — must yield nothing
    (50L, 60L, 55L)   // inverted — must yield nothing
  ).toDF("iid", "s", "e")

  test("matches the brute-force non-equi join on boundary alignments") {
    for (width <- Seq(1L, 3L, 10L, 64L)) {
      val got = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", width)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = points.join(intervals, $"t" >= $"s" && $"t" < $"e")
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"width=$width")
      assert(want.nonEmpty) // the fixture must actually exercise matches
    }
  }

  test("each qualifying pair appears exactly once (no bucket-overlap dupes)") {
    val r = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 2L)
      .groupBy("pid", "iid").count().filter($"count" > 1)
    assert(r.isEmpty, "a (point, interval) pair must meet in exactly one bucket")
  }

  test("the plan is an equi-join — no nested loop, no cartesian product") {
    val df = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 10L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
