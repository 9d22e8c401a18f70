package graft.kql

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Tabular-pipeline parser + semantics. The oracle-gated q_kql_* queries in
  * Surface prove end-to-end equivalence with SQL on real data; this suite
  * pins the operators and edge cases the oracles don't reach (distinct,
  * project-away, countif, infix string predicates, default-desc ordering,
  * comments, quote safety, error paths).
  */
class KqlPipelineSpec extends SparkSuite {

  import spark.implicits._

  private lazy val people: DataFrame = Seq(
    (1L, "Alice", "admin role", 30, 10.0),
    (2L, "bob", "user", 25, 20.0),
    (3L, "Carol", "ADMIN", 35, 20.0),
    (4L, "dave", "user | guest", 40, 5.0),
    (5L, "Eve", "guest", 35, 15.0)
  ).toDF("id", "name", "role", "age", "score")

  private lazy val depts: DataFrame = Seq(
    ("admin role", "ops"), ("user", "product"), ("guest", "community")
  ).toDF("role", "dept")

  private def run(kql: String): DataFrame =
    KqlPipeline.run(Map("people" -> people, "depts" -> depts), kql)

  test("T | count yields a single Count column") {
    val r = run("people | count").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(5L))
    assert(run("people | count").columns.toSeq == Seq("Count"))
  }

  test("where ==, and, comparison; take") {
    assert(run("people | where age == 35 and score > 10.0 | count")
      .head().getLong(0) == 2L)
    assert(run("people | where age >= 30 | take 2").count() == 2L)
  }

  test("extend + project with rename") {
    val r = run("people | extend dbl = score * 2.0 | project id, v = dbl | order by id asc")
    assert(r.columns.toSeq == Seq("id", "v"))
    assert(r.collect().map(_.getDouble(1)).toSeq == Seq(20.0, 40.0, 40.0, 10.0, 30.0))
  }

  test("project-away drops columns; project-keep selects; project-rename renames") {
    assert(run("people | project-away role, score").columns.toSeq ==
      Seq("id", "name", "age"))
    assert(run("people | project-keep name, id").columns.toSeq == Seq("name", "id"))
    val r = run("people | project-rename who = name | where who =~ 'alice' | count")
    assert(r.head().getLong(0) == 1L)
  }

  test("summarize with by: aggs, default names, countif/dcount") {
    val r = run(
      """people
        | | summarize n = count(), countif(score > 10.0), dcount(score) by age
        | | order by age asc""".stripMargin)
    assert(r.columns.toSeq == Seq("age", "n", "countif_", "dcount_score"))
    val m = r.collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(m(35) == ((2L, 2L, 2L)))  // Carol 20.0, Eve 15.0
    assert(m(25) == ((1L, 1L, 1L)))
  }

  test("summarize without by is a global aggregate; arg_max picks the row maximizer") {
    val r = run("people | summarize best = arg_max(score, name), total = sum(id)").head()
    assert(r.getString(0) == "bob" || r.getString(0) == "Carol") // score 20.0 tie
    assert(r.getLong(1) == 15L)
  }

  test("summarize by without aggregates = distinct") {
    assert(run("people | summarize by age").count() == 4L)
  }

  test("order by defaults to DESC (KQL semantics); top N by") {
    assert(run("people | order by id | take 1").head().getLong(0) == 5L)
    assert(run("people | top 2 by id | project id").collect().map(_.getLong(0)).toSeq ==
      Seq(5L, 4L))
    assert(run("people | top 2 by id asc | project id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
  }

  test("distinct columns and distinct *") {
    assert(run("people | distinct age").count() == 4L)
    assert(run("people | distinct *").count() == 5L)
  }

  test("infix string predicates are case-insensitive; negation") {
    assert(run("people | where role has 'admin' | count").head().getLong(0) == 2L)
    assert(run("people | where role startswith 'ADMIN' | count").head().getLong(0) == 2L)
    assert(run("people | where role endswith 'GUEST' | count").head().getLong(0) == 2L)
    assert(run("people | where name =~ 'ALICE' | count").head().getLong(0) == 1L)
    assert(run("people | where role !has 'admin' | count").head().getLong(0) == 3L)
  }

  test("a | inside a string literal does not split the pipeline; has inside a literal survives") {
    assert(run("people | where role == 'user | guest' | count").head().getLong(0) == 1L)
    // `has` inside the literal operand must not be rewritten
    assert(run("people | where role == 'x has y' | count").head().getLong(0) == 0L)
    // ...including inside DOUBLE-quoted literals (both quote kinds open one)
    assert(run("people | where role == \"x has y\" | count").head().getLong(0) == 0L)
  }

  test("join kinds: inner on key, leftouter keeps unmatched left rows") {
    val inner = run("people | join (depts) on role | project id, dept | order by id asc")
    assert(inner.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "ops"), (2L, "product"), (5L, "community")))

    val lo = run("people | join kind=leftouter (depts) on role | count")
    assert(lo.head().getLong(0) == 5L)

    val semi = run("people | join kind=leftanti (depts) on role | project id | order by id asc")
    assert(semi.collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))

    // rightsemi/rightanti: side-swapped left joins — RIGHT-side columns only,
    // and $left/$right in the on-clause keep naming the ORIGINAL sides
    val rs = run("people | join kind=rightsemi (depts) on $left.role == $right.role " +
      "| project dept | order by dept asc")
    assert(rs.collect().map(_.getString(0)).toSeq == Seq("community", "ops", "product"))
    assert(rs.columns.toSeq == Seq("dept")) // no left-side columns leak through
    val ra = run("people | where id <= 2 | join kind=rightanti (depts) on role " +
      "| project dept | order by dept asc")
    assert(ra.collect().map(_.getString(0)).toSeq == Seq("community"))
  }

  test("hll sketch columns: merged partials estimate equals the direct sketch") {
    // hll() per role → hll_merge() roll-up must estimate exactly what one
    // global hll() estimates (sketch merge is lossless and order-free);
    // at 4 distinct ages the sketch is in exact mode, so the value is 4
    val merged = run(
      """people
        | | summarize h = hll(age) by role
        | | summarize m = hll_merge(h)
        | | project est = dcount_hll(m)""".stripMargin).head().getLong(0)
    val direct = run(
      "people | summarize h = hll(age) | project est = dcount_hll(h)")
      .head().getLong(0)
    assert(merged == direct && merged == 4L)
    // dcount_intersect: inclusion-exclusion over sketch unions — ages
    // {25,30} ∩ {30,35,40} = {30}, exact at this cardinality
    val inter = run(
      """people
        | | summarize a = hll(iff(age <= 30, age, tolong(''))),
        |     b = hll(iff(age >= 30, age, tolong('')))
        | | project i = dcount_intersect(a, b)""".stripMargin).head().getLong(0)
    assert(inter == 1L)
  }

  test("join with $left/$right equality and sub-pipeline right side") {
    val r = run(
      "people | join kind=inner (depts | where dept != 'ops') on $left.role == $right.role | count")
    assert(r.head().getLong(0) == 2L)

    // innerunique dedups the LEFT side only: ages (30,25,35,40,35) dedup to
    // 4 keys, the right keeps its duplicate 35 → 5 result rows (plain inner
    // keeps both left 35s → 7)
    val iu = run("people | project age | join kind=innerunique (people | project age) on age | count")
    assert(iu.head().getLong(0) == 5L)
    val in = run("people | project age | join kind=inner (people | project age) on age | count")
    assert(in.head().getLong(0) == 7L)
  }

  test("has with a multi-term literal needle matches the adjacent-term phrase") {
    // 'admin-role' → terms [admin, role]; "admin role" has them adjacent
    assert(run("people | where role has 'admin-role' | count").head().getLong(0) == 1L)
    // separator-agnostic: "user | guest" carries [user, guest] adjacently
    assert(run("people | where role has 'user guest' | count").head().getLong(0) == 1L)
    // order matters for a phrase
    assert(run("people | where role has 'role admin' | count").head().getLong(0) == 0L)
    // sub-term pieces still don't match (whole-term boundaries hold)
    assert(run("people | where name has 'ali-ce' | count").head().getLong(0) == 0L)
    // negation composes
    assert(run("people | where role !has 'admin-role' | count").head().getLong(0) == 4L)
    // `search` follows the same phrase semantics across all string columns
    assert(run("people | search 'admin role' | count").head().getLong(0) == 1L)
    assert(run("people | search 'user guest' | count").head().getLong(0) == 1L)
    // has_any / has_all route phrase needles through the same regex
    assert(run("people | where role has_any ('admin-role', 'guest') | count")
      .head().getLong(0) == 3L) // id1 (phrase), id4+id5 (term guest)
    assert(run("people | where role has_all ('user guest', 'user') | count")
      .head().getLong(0) == 1L) // id4 only
  }

  test("scan: restricted funnel subset — latest-start attribution, reset on completion") {
    // per user u: A=signup, B=buy. u=1: A@1 A@2 B@3 B@4 A@5 B@6 →
    // completions (2,3) [latest A wins] and (5,6) [B@4 finds no A after B@3].
    // u=2: B@1 A@2 B@3 → completion (2,3) only.
    val r = run(
      """datatable (u:long, t:long, e:string) [
        |  1, 1, 'A',  1, 2, 'A',  1, 3, 'B',  1, 4, 'B',  1, 5, 'A',  1, 6, 'B',
        |  2, 1, 'B',  2, 2, 'A',  2, 3, 'B'
        |]
        | | scan partition by u order by t with (step sa output=none: e == 'A'; step sb: e == 'B')
        | | project u, sa_t, sb_t
        | | order by u asc, sb_t asc""".stripMargin)
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 2L, 3L), (1L, 5L, 6L), (2L, 2L, 3L)))
  }

  test("scan: three steps need the full sequence; earlier-step match restarts deeper state") {
    // u=1: A@1 B@2 A@3 C@4 → C@4 can't complete (A@3 cleared B@2's state).
    // u=2: A@1 B@2 C@3 → completes with (1,2,3).
    val r = run(
      """datatable (u:long, t:long, e:string) [
        |  1, 1, 'A',  1, 2, 'B',  1, 3, 'A',  1, 4, 'C',
        |  2, 1, 'A',  2, 2, 'B',  2, 3, 'C'
        |]
        | | scan partition by u order by t with (
        |     step s1 output=none: e == 'A'; step s2 output=none: e == 'B'; step s3: e == 'C')
        | | project u, s1_t, s2_t, s3_t""".stripMargin)
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq ==
      Seq((2L, 1L, 2L, 3L)))
  }

  test("scan output modes and with_match_id: all emits admitted rows, last at completion") {
    val dt =
      """datatable (u:long, t:long, e:string) [
        |  1, 1, 'A',  1, 2, 'A',  1, 3, 'B',  1, 4, 'B',  1, 5, 'A',  1, 6, 'B'
        |]""".stripMargin
    def rows(r: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      r.collect().map(x => (x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2), x.getLong(3))).toSeq
    // ADX default output=all: every admitted row emits with state-so-far;
    // mid: each A admission starts a new sequence instance
    val all = run(
      s"""$dt
         | | scan with_match_id = mid partition by u order by t with (
         |     step sa: e == 'A'; step sb: e == 'B')
         | | project u, sa_t, sb_t, mid
         | | order by mid asc, sb_t asc""".stripMargin)
    assert(rows(all) == Seq(
      (1L, -1L, 0L), (2L, -1L, 1L), (2L, 3L, 1L), (5L, -1L, 2L), (5L, 6L, 2L)))
    // output=last: only the span's LAST admitted row, at completion —
    // A@1's held row is replaced by A@2 and never emits
    val last = run(
      s"""$dt
         | | scan with_match_id = mid partition by u order by t with (
         |     step sa output=last: e == 'A'; step sb: e == 'B')
         | | project u, sa_t, sb_t, mid
         | | order by mid asc, sb_t asc""".stripMargin)
    assert(rows(last) == Seq(
      (2L, -1L, 1L), (2L, 3L, 1L), (5L, -1L, 2L), (5L, 6L, 2L)))
    // a silent FINAL step still completes (resets state), emitting nothing
    val silentFinal = run(
      s"""$dt
         | | scan partition by u order by t with (
         |     step sa: e == 'A'; step sb output=none: e == 'B')
         | | project u, sa_t, sb_t
         | | order by sa_t asc""".stripMargin)
    assert(silentFinal.collect().map(x => x.getLong(1)).toSeq == Seq(1L, 2L, 5L))
  }

  test("partition by with a general sub-pipeline: where | summarize | top per key") {
    val dt =
      """datatable (k:string, c:string, v:long) [
        |  'a', 'x', 1,  'a', 'x', 2,  'a', 'y', 10,  'a', 'z', 3,
        |  'b', 'x', 5,  'b', 'y', 1,  'b', 'y', 2
        |]""".stripMargin
    // a: v>1 → x:2 y:10 z:3, top by sum → (y,10); b: x:5 y:2 → (x,5)
    val r = run(
      s"""$dt
         | | partition by k (
         |     where v > 1
         |     | summarize s = sum(v) by c
         |     | top 1 by s desc, c asc)
         | | order by k asc""".stripMargin)
    assert(r.select("k", "c", "s").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq ==
      Seq(("a", "y", 10L), ("b", "x", 5L)))
    // count keeps the key (documented divergence: the key survives output)
    val r2 = run(
      s"""$dt
         | | partition by k (where v > 1 | count)
         | | order by k asc""".stripMargin)
    assert(r2.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 2L)))
    // distinct adds the key to the listed columns
    val r3 = run(
      s"""$dt
         | | partition by k (distinct c)
         | | order by k asc, c asc""".stripMargin)
    assert(r3.collect().map(x => (x.getString(0), x.getString(1))).toSeq ==
      Seq(("a", "x"), ("a", "y"), ("a", "z"), ("b", "x"), ("b", "y")))
    // unsupported stages are rejected loudly
    val e = intercept[IllegalArgumentException](run(
      s"$dt | partition by k (take 2)"))
    assert(e.getMessage.contains("unsupported stage"))
  }

  test("scan declare: state variables accumulate per span and reset at completion") {
    // cnt counts A-matches, vsum sums v over matched rows, vmax tracks the
    // max A-value, vfirst captures the first A-value, vlast the latest.
    // u=1: A@1(v10) A@2(v20) B@3(v5) → emit (sa=2, cnt=2, vsum=35, vmax=20,
    // vfirst=10, vlast=20); B@4 matches nothing (state empty → no update);
    // A@5(v7) B@6(v2) → (sa=5, cnt=1, vsum=9, vmax=7, vfirst=7, vlast=7).
    // u=2: B@1 no match; A@2(v4) B@3(v8) → (cnt=1, vsum=12, 4, 4, 4).
    val r = run(
      """datatable (u:long, t:long, e:string, v:long) [
        |  1, 1, 'A', 10,  1, 2, 'A', 20,  1, 3, 'B', 5,
        |  1, 4, 'B', 1,   1, 5, 'A', 7,   1, 6, 'B', 2,
        |  2, 1, 'B', 9,   2, 2, 'A', 4,   2, 3, 'B', 8
        |]
        | | scan declare (cnt = 0, vsum = 0, vmax = 0, vfirst = long(null), vlast = long(null))
        |     partition by u order by t with (
        |     step sa output=none: e == 'A' => cnt = cnt + 1, vsum = vsum + v, vmax = max(vmax, v),
        |                          vfirst = coalesce(vfirst, v), vlast = v;
        |     step sb: e == 'B' => vsum = vsum + v)
        | | project u, sa_t, sb_t, cnt, vsum, vmax, vfirst, vlast
        | | order by u asc, sb_t asc""".stripMargin)
    assert(r.collect().map(x => (0 to 7).map(x.getLong)).toSeq == Seq(
      Seq(1L, 2L, 3L, 2L, 35L, 20L, 10L, 20L),
      Seq(1L, 5L, 6L, 1L, 9L, 7L, 7L, 7L),
      Seq(2L, 2L, 3L, 1L, 12L, 4L, 4L, 4L)))
  }

  test("partition by (order by | extend): grouped cumsum/prev/next/row_number via key windows") {
    val r = run(
      """datatable (g:string, t:long, v:long) [
        |  'a', 1, 10,  'a', 2, 20,  'a', 3, 30,
        |  'b', 1, 5,   'b', 2, 7
        |]
        | | partition by g (order by t asc
        |     | extend cum = row_cumsum(v), p = prev(v), nx = next(v, 1, -1), rn = row_number())
        | | order by g asc, t asc
        | | project g, t, cum, p, nx, rn""".stripMargin)
    val got = r.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
      if (x.isNullAt(3)) -99L else x.getLong(3), x.getLong(4), x.getLong(5))).toSeq
    assert(got == Seq(
      ("a", 1L, 10L, -99L, 20L, 1L), ("a", 2L, 30L, 10L, 30L, 2L),
      ("a", 3L, 60L, 20L, -1L, 3L),
      ("b", 1L, 5L, -99L, 7L, 1L), ("b", 2L, 12L, 5L, -1L, 2L)))
  }

  test("row_rank_min: run-start row number, grouped and serialized") {
    // grouped (partition by): per-key windows
    val r = run(
      """datatable (g:string, t:long, v:long) [
        |  'a', 1, 10,  'a', 2, 10,  'a', 3, 20,  'a', 4, 10,
        |  'b', 1, 5,   'b', 2, 5
        |]
        | | partition by g (order by t asc | extend rm = row_rank_min(v))
        | | order by g asc, t asc | project g, t, rm""".stripMargin)
    assert(r.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 3L), ("a", 4L, 4L),
        ("b", 1L, 1L), ("b", 2L, 1L)))
    // serialized (global): distSinceTrue path
    val s = run(
      """datatable (t:long, v:long) [ 1, 7, 2, 7, 3, 9, 4, 9, 5, 7 ]
        | | order by t asc | serialize
        | | extend rm = row_rank_min(v) | project t, rm""".stripMargin)
    assert(s.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L)))
  }

  test("row_cumsum with a restart condition resets the running sum") {
    val r = run(
      """datatable (t:long, v:long, rst:bool) [
        |  1, 10, false,  2, 20, false,  3, 5, true,  4, 1, false,  5, 2, true
        |]
        | | order by t asc | serialize
        | | extend cum = row_cumsum(v, rst)
        | | project t, cum""".stripMargin)
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 30L), (3L, 5L), (4L, 6L), (5L, 2L)))
  }

  test("bare join defaults to innerunique, matching ADX") {
    val bare = run("people | project age | join (people | project age) on age | count")
    assert(bare.head().getLong(0) == 5L) // == kind=innerunique, not inner's 7
  }

  test("lookup broadcasts the dim side and defaults to leftouter") {
    val r = run("people | lookup (depts) on role | count")
    assert(r.head().getLong(0) == 5L)
    val plan = run("people | lookup (depts) on role").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"lookup did not broadcast:\n$plan")
  }

  test("union by name with null padding; sub-pipeline operand") {
    assert(run("people | union people | count").head().getLong(0) == 10L)
    val r = run("people | union (depts | where dept == 'ops') | count")
    assert(r.head().getLong(0) == 6L)
    // padding: dept is null on people rows
    val padded = run("people | union (depts | where dept == 'ops') | where isempty(dept) | count")
    assert(padded.head().getLong(0) == 5L)
  }

  test("mv-expand explodes dynamic columns") {
    val r = run("people | extend w = split(role, ' ') | mv-expand w | summarize n = count() by id | order by id asc")
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (3L, 1L), (4L, 3L), (5L, 1L)))
  }

  test("mv-expand with_itemindex rides the 0-based element position") {
    val r = run(
      """people | where id == 1
        | | extend w = split(role, ' ')
        | | mv-expand with_itemindex = ix w
        | | project ix, w
        | | order by ix asc""".stripMargin)
      .collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((0L, "admin"), (1L, "role")))
  }

  test("mv-expand with_itemindex drops rows whose array is empty, like the no-index path") {
    import spark.implicits._
    // sequence(0, size-1) on an empty array would step BACKWARDS to [0,-1]
    // and fabricate two null rows; the guarded lane must yield none
    val df = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]), (3L, Seq("c")))
      .toDF("id", "w")
    val r = graft.kql.KqlPipeline.run(_ => df,
      "t | mv-expand with_itemindex = ix w | project id, ix, w | order by id asc, ix asc")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.toSeq == Seq((1L, 0L, "a"), (1L, 1L, "b"), (3L, 0L, "c")))
  }

  test("evaluate pivot with explicit values skips the domain-discovery pass") {
    val r = run(
      """people | project role, score
        | | evaluate pivot(role, sum(score), 'user', 'guest')""".stripMargin)
    assert(r.columns.toSeq == Seq("user", "guest"))
    val row = r.head()
    assert(row.getDouble(0) == 20.0 && row.getDouble(1) == 15.0)
  }

  test("parse extracts lazily between literals") {
    val logs = Seq((1L, "user=alice action=login dur=30ms"),
                   (2L, "user=bob action=logout dur=5ms")).toDF("id", "line")
    val r = KqlPipeline.run(Map("logs" -> logs),
      "logs | parse line with 'user=' u ' action=' act ' dur=' d 'ms' | project id, u, act, d | order by id asc")
    assert(r.collect().map(x => (x.getString(1), x.getString(2), x.getString(3))).toSeq ==
      Seq(("alice", "login", "30"), ("bob", "logout", "5")))
  }

  test("parse is anchored at the start; leading * skips a prefix") {
    val logs = Seq((1L, "user=alice end"), (2L, "junk user=bob end")).toDF("id", "line")
    // anchored: the row with a prefix does NOT match (KQL semantics)
    val strict = KqlPipeline.run(Map("logs" -> logs),
      "logs | parse line with 'user=' u ' end' | where isnotempty(u) | project id")
    assert(strict.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // leading * opts into prefix skipping
    val starred = KqlPipeline.run(Map("logs" -> logs),
      "logs | parse line with * 'user=' u ' end' | where isnotempty(u) | count")
    assert(starred.head().getLong(0) == 2L)
  }

  test("mv-expand over several columns zips element-wise (not a cartesian product)") {
    val r = run(
      """people | where id == 1
        | | extend a = split(role, ' '), b = split(role, ' ')
        | | mv-expand a, b
        | | summarize n = count(), same = countif(a == b)""".stripMargin)
    val row = r.head()
    assert(row.getLong(0) == 2L, "zip must yield one row per element index, not len²")
    assert(row.getLong(1) == 2L, "zipped elements must pair index-to-index")
  }

  test("join body spanning several lines parses (kind= with newline before the operand)") {
    val r = run(
      "people | join kind=leftouter (\n  depts | where dept != 'ops'\n) on role | count")
    assert(r.head().getLong(0) == 5L)
  }

  test("getschema lists columns; series helpers reduce make-series arrays") {
    val sc = run("people | getschema").collect()
    assert(sc.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("id", 0L), ("name", 1L), ("role", 2L), ("age", 3L), ("score", 4L)))
    assert(sc.head.getString(2) == "bigint")

    val r = run(
      """people
        | | make-series n = count() on age from 20 to 45 step 5
        | | project total = series_sum(n), peak = series_max(n),
        |           mean = series_avg(n), pts = array_length(n)""".stripMargin)
    val row = r.head()
    assert(row.getDouble(0) == 5.0)   // all five people inside [20,45)
    assert(row.getLong(1) == 2L)      // two aged 35
    assert(row.getDouble(2) == 1.0)   // 5 people / 5 axis points
    assert(row.getInt(3) == 5)
  }

  test("make-series fills gaps with the default over the [from,to) numeric axis") {
    val pts = Seq((0L, "a"), (5L, "a"), (5L, "a"), (25L, "a"), (0L, "b")).toDF("t", "k")
    val r = KqlPipeline.run(Map("pts" -> pts),
      "pts | make-series n = count() on t from 0 to 30 step 10 by k | order by k asc")
    assert(r.columns.toSeq == Seq("k", "t", "n"))
    val rows = r.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getSeq[Long](1) == Seq(0L, 10L, 20L), "axis must be [from,to) by step")
    assert(rows(0).getSeq[Long](2) == Seq(3L, 0L, 1L), "gap must fill with default 0")
    assert(rows(1).getSeq[Long](2) == Seq(1L, 0L, 0L))
    // custom default + global series (no by)
    val g = KqlPipeline.run(Map("pts" -> pts),
      "pts | make-series m = max(t) default = -1 on t from 0 to 30 step 10")
    assert(g.collect().head.getSeq[Long](1) == Seq(5L, -1L, 25L))
  }

  test("conditional and statistical aggregates") {
    val r = run(
      """people | summarize s = sumif(score, age > 30), m = maxif(score, age > 30),
        |  d = dcountif(role, age >= 30), sd = stdev(score), p = percentile(score, 50)""".stripMargin)
    val row = r.head()
    assert(row.getDouble(0) == 40.0) // Carol 20 + Dave 5 + Eve 15
    assert(row.getDouble(1) == 20.0)
    assert(row.getAs[Number](2).longValue == 4L)     // admin role, ADMIN, user | guest, guest
    assert(math.abs(row.getDouble(3) - 6.519) < 0.01)
    assert(row.getDouble(4) == 15.0)
  }

  test("has is a whole-term match (ADX semantics), not substring") {
    val docs = Seq((1L, "administrators"), (2L, "the admin team"), (3L, "Admin-ops"))
      .toDF("id", "t")
    val r = KqlPipeline.run(Map("docs" -> docs), "docs | where t has 'admin' | project id")
    // 'administrators' must NOT match; 'Admin-ops' splits to [admin, ops] and does
    assert(r.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("// comments are stripped outside literals") {
    assert(run(
      """people            // catalog table
        | | where age > 30 // keep the old
        | | count""".stripMargin).head().getLong(0) == 3L)
  }

  test("KQL scalars flow through KqlCompat: iff/strcat/tolong/strlen") {
    val r = run(
      """people
        | | extend tag = iff(age >= 35, strcat(name, '!'), name)
        | | where strlen(tag) > 5 | project tag | order by tag asc""".stripMargin)
    assert(r.collect().map(_.getString(0)).toSeq == Seq("Carol!"))
  }

  test("error paths are loud: unknown operator, bad aggregate, expression in head") {
    intercept[IllegalArgumentException](run("people | facet by role"))
    intercept[IllegalArgumentException](run("people | join (depts) kind_missing_on"))
    intercept[IllegalArgumentException](run("people | summarize median(age)"))
    intercept[IllegalArgumentException](run("people | extend score * 2"))
    intercept[IllegalArgumentException](KqlPipeline.run(Map.empty[String, DataFrame], "people x | count"))
    // evaluate-plugin argument validation: wrong arity, non-constant scalar
    // args, and non-column identifiers must all fail at compile time
    intercept[IllegalArgumentException](
      run("people | evaluate sliding_window_counts(id, age, 0, 100)"))
    intercept[IllegalArgumentException](
      run("people | evaluate activity_counts_metrics(id, age, 0, 100, age)"))
    intercept[IllegalArgumentException](
      run("people | evaluate active_users_count(id + 1, age, 0, 100, 10, 10, 2, 10)"))
    intercept[IllegalArgumentException](
      run("people | evaluate funnel_sequence_completion(id, age, role, 'a', 'b')"))
  }

  test("the pipeline composes with Structured Streaming (plan-level, no batch assumptions)") {
    import org.apache.spark.sql.streaming.Trigger
    val src = tmpDir("kql-stream-src"); val ckpt = tmpDir("kql-stream-ckpt")
    people.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(people.schema).parquet(src)
    // stateless KQL operators apply to a streaming frame exactly as to a
    // batch one — the pipeline builds a plan, never collects
    val q = KqlPipeline.run(Map("people_stream" -> stream),
        "people_stream | where age >= 30 | extend tag = strcat(name, '!') | project id, tag")
      .writeStream.format("memory").queryName("kql_stream")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("kql_stream").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L))
    assert(rows.map(_.getString(1)).toSet == Set("Alice!", "Carol!", "dave!", "Eve!"))
  }

  test("make_set is sorted (deterministic) and make_list collects") {
    val r = run("people | summarize ages = make_set(age) by score | where score == 20.0")
    assert(r.head().getSeq[Int](1).sorted == r.head().getSeq[Int](1))
  }

  // ---- let statements ------------------------------------------------------

  test("scalar let is macro-substituted; tabular let extends the catalog") {
    val r = run(
      """let cutoff = 30;
        |let grown = people | where age >= cutoff;
        |grown | summarize n = count(), youngest = min(age)""".stripMargin)
    assert(r.head().getLong(0) == 4L)
    assert(r.head().getInt(1) == 30)
  }

  test("let: scalar references earlier scalar; tabular alias of a table; join over a let") {
    val r = run(
      """let lo = 10;
        |let hi = lo * 2;
        |people | where score >= lo and score <= hi | count""".stripMargin)
    assert(r.head().getLong(0) == 4L) // 10, 20, 20, 15

    val alias = run("let p2 = people; p2 | count")
    assert(alias.head().getLong(0) == 5L)

    val joined = run(
      """let d2 = depts | where dept != 'ops';
        |people | join kind=inner (d2) on role | count""".stripMargin)
    assert(joined.head().getLong(0) == 2L)
  }

  test("scalar let substitution skips string literals and column-name LHS") {
    val r = run(
      """let needle = 'admin';
        |people | where role has needle | count""".stripMargin)
    assert(r.head().getLong(0) == 2L)
    // the literal 'cutoff' inside a string is NOT substituted
    val lit = run(
      """let cutoff = 99;
        |people | extend tag = 'cutoff' | where tag == 'cutoff' | count""".stripMargin)
    assert(lit.head().getLong(0) == 5L)
  }

  // ---- source operators ----------------------------------------------------

  test("datatable builds an inline literal table") {
    val r = run(
      """datatable (k:string, v:long) ['a', 1, 'b', 2, 'a', 3]
        | | summarize s = sum(v) by k | order by k asc""".stripMargin)
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("a", 4L), ("b", 2L)))
  }

  test("range generates a stop-inclusive numeric axis; print yields one row") {
    val r = run("range x from 1 to 10 step 3 | summarize n = count(), last = max(x)")
    assert(r.head().getLong(0) == 4L)  // 1, 4, 7, 10
    assert(r.head().getLong(1) == 10L)
    // expression bounds fall back to sequence
    val e = run("range x from 0 to 2 + 2 step 2 | count")
    assert(e.head().getLong(0) == 3L)  // 0, 2, 4
    val p = run("print a = 1 + 1, strcat('x', 'y')")
    assert(p.columns.toSeq == Seq("a", "print_1"))
    assert(p.head().getInt(0) == 2)
    assert(p.head().getString(1) == "xy")
  }

  test("externaldata reads parquet and csv with a declared schema") {
    val dir = tmpDir("kql-externaldata")
    people.select($"id", $"name", $"age").write.mode("overwrite").parquet(s"$dir/p")
    val pq = run(
      s"""externaldata (id:long, age:int) ['$dir/p'] with (format='parquet')
         | | where age > 30 | count""".stripMargin)
    assert(pq.head().getLong(0) == 3L)

    people.select($"id", $"name").write.mode("overwrite")
      .option("header", "true").csv(s"$dir/c")
    val csv = run(
      s"""externaldata (id:long, name:string) ['$dir/c'] with (format='csv', ignoreFirstRecord=true)
         | | summarize n = count(), ids = sum(id)""".stripMargin)
    assert(csv.head().getLong(0) == 5L)
    assert(csv.head().getLong(1) == 15L)
  }

  // ---- predicates ----------------------------------------------------------

  test("between, !in, in~, has_any, has_all, hasprefix, hassuffix, matches regex") {
    assert(run("people | where age between (25 .. 35) | count").head().getLong(0) == 4L)
    assert(run("people | where age !between (25 .. 35) | count").head().getLong(0) == 1L)
    assert(run("people | where name !in ('Alice', 'Eve') | count").head().getLong(0) == 3L)
    assert(run("people | where name in~ ('ALICE', 'BOB') | count").head().getLong(0) == 2L)
    assert(run("people | where role has_any ('admin', 'guest') | count").head().getLong(0) == 4L)
    assert(run("people | where role has_all ('user', 'guest') | count").head().getLong(0) == 1L)
    assert(run("people | where role hasprefix 'gue' | count").head().getLong(0) == 2L)
    assert(run("people | where role hassuffix 'ole' | count").head().getLong(0) == 1L)
    assert(run("people | where name matches regex '^[A-Z]' | count").head().getLong(0) == 3L)
  }

  test("case-sensitive predicate family (_cs): no case fold, same term boundaries") {
    assert(run("people | where role has_cs 'admin' | count").head().getLong(0) == 1L)
    assert(run("people | where role has_cs 'ADMIN' | count").head().getLong(0) == 1L)
    // still whole-term: a term prefix is not a match
    assert(run("people | where role has_cs 'adm' | count").head().getLong(0) == 0L)
    assert(run("people | where role contains_cs 'ADM' | count").head().getLong(0) == 1L)
    assert(run("people | where role contains_cs 'adm' | count").head().getLong(0) == 1L)
    assert(run("people | where name startswith_cs 'alice' | count").head().getLong(0) == 0L)
    assert(run("people | where name startswith_cs 'Alice' | count").head().getLong(0) == 1L)
    assert(run("people | where name endswith_cs 'OB' | count").head().getLong(0) == 0L)
    assert(run("people | where name endswith_cs 'ob' | count").head().getLong(0) == 1L)
    assert(run("people | where role hasprefix_cs 'gue' | count").head().getLong(0) == 2L)
    assert(run("people | where role hasprefix_cs 'GUE' | count").head().getLong(0) == 0L)
    assert(run("people | where role hassuffix_cs 'ole' | count").head().getLong(0) == 1L)
    assert(run("people | where role hassuffix_cs 'OLE' | count").head().getLong(0) == 0L)
    // negation composes
    assert(run("people | where role !has_cs 'ADMIN' | count").head().getLong(0) == 4L)
    // multi-term literal needle: adjacent-term phrase, case-sensitive
    assert(run("people | where role has_cs 'admin role' | count").head().getLong(0) == 1L)
    assert(run("people | where role has_cs 'Admin role' | count").head().getLong(0) == 0L)
  }

  // ---- new operators -------------------------------------------------------

  test("parse-where keeps only matching rows") {
    val logs = Seq((1L, "user=alice end"), (2L, "garbage")).toDF("id", "line")
    val r = KqlPipeline.run(Map("logs" -> logs),
      "logs | parse-where line with 'user=' u ' end' | project id, u")
    assert(r.collect().map(x => (x.getLong(0), x.getString(1))).toSeq == Seq((1L, "alice")))
  }

  test("search matches whole terms across all string columns") {
    val r = run("people | search 'admin' | project id | order by id asc")
    // role 'admin role' (id 1) and 'ADMIN' (id 3); 'administrators' would not match
    assert(r.collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("serialize + row_number assigns a global index in sort order") {
    val r = run(
      """people | order by score desc, id asc | serialize
        | | extend rn = row_number() | project rn, id""".stripMargin)
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 3L), (3L, 5L), (4L, 1L), (5L, 4L)))
    val r10 = run("people | order by id asc | extend rn = row_number(10) | summarize m = min(rn)")
    assert(r10.head().getLong(0) == 10L)
  }

  test("top-nested: level-1 top-k, level-2 ranked within each kept key") {
    val sales = Seq(
      ("eu", "fr", 10L), ("eu", "de", 30L), ("eu", "it", 20L),
      ("us", "ca", 100L), ("us", "ny", 50L),
      ("ap", "jp", 1L)
    ).toDF("region", "country", "amt")
    val r = KqlPipeline.run(Map("sales" -> sales),
      """sales
        | | top-nested 2 of region by total = sum(amt),
        |   top-nested 1 of country by t2 = sum(amt)
        | | order by total desc""".stripMargin)
    assert(r.columns.toSeq == Seq("region", "total", "country", "t2"))
    assert(r.collect().map(x => (x.getString(0), x.getLong(1), x.getString(2), x.getLong(3))).toSeq ==
      Seq(("us", 150L, "ca", 100L), ("eu", 60L, "de", 30L)))
  }

  test("evaluate pivot spreads the pivot column into per-value columns") {
    val r = run(
      """people | project role = iff(role has 'admin', 'admin', 'other'), age
        | | evaluate pivot(role, max(age))
        | | order by admin asc nulls last""".stripMargin)
    // grouped by nothing left but the pivot pair → one row: max age per role
    assert(r.columns.toSet == Set("admin", "other"))
    assert(r.head().getInt(r.columns.indexOf("admin")) == 35)
    assert(r.head().getInt(r.columns.indexOf("other")) == 40)
  }

  test("percentiles expands to one exact percentile column per argument") {
    val r = run("people | summarize percentiles(score, 25, 50, 75)")
    assert(r.columns.toSeq ==
      Seq("percentile_score_25", "percentile_score_50", "percentile_score_75"))
    assert(r.head().getDouble(1) == 15.0)
  }

  test("bracket indexing is 0-based and null-safe; summarize hints are dropped") {
    val r = run("people | extend first_word = split(role, ' ')[0] | where first_word == 'admin' | count")
    assert(r.head().getLong(0) == 1L)
    // out-of-bounds yields null (ADX), not an ANSI error
    val r2 = run("people | extend w9 = split(role, ' ')[9] | where isempty(w9) | count")
    assert(r2.head().getLong(0) == 5L)
    // an index inside a string literal is untouched
    assert(run("people | where role == 'x[0]' | count").head().getLong(0) == 0L)
    val r3 = run("people | summarize hint.shufflekey=role hint.num_partitions=8 n = count() by role")
    assert(r3.count() == 5L) // five distinct roles
  }

  test("mv-expand to typeof casts the expanded element") {
    val r = run(
      """datatable (id:long, xs:string) [1, '7', 2, '9']
        | | extend arr = split(xs, ';')
        | | mv-expand arr to typeof(long)
        | | summarize s = sum(arr)""".stripMargin)
    assert(r.head().getLong(0) == 16L)
    intercept[IllegalArgumentException](run(
      "people | extend w = split(role, ' ') | mv-expand w to typeof(nosuch)"))
  }

  test("union as a source with withsource labels each operand's rows") {
    val r = run(
      """union withsource=src people, depts
        | | summarize n = count() by src
        | | order by src asc""".stripMargin)
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("depts", 3L), ("people", 5L)))
    // null padding across mismatched schemas + sub-pipeline operands
    val r2 = run(
      "union withsource=s (people | project id), (depts | project dept) | summarize d = dcount(s)")
    assert(r2.head().getLong(0) == 2L)
  }

  test("tuple array_sort_asc/desc: first array orders, the rest permute") {
    val r = run(
      """people | where id == 1
        | | extend (sq, sp) = array_sort_asc(dynamic([3, 1, 2]), dynamic(['c', 'a', 'b']))
        | | extend (dq, dp, di) = array_sort_desc(dynamic([3, 1, 2]),
        |     dynamic(['c', 'a', 'b']), dynamic([30, 10, 20]))
        | | project sq, sp, dq, dp, di""".stripMargin).head
    assert(r.getSeq[Long](0) == Seq(1L, 2L, 3L))
    assert(r.getSeq[String](1) == Seq("a", "b", "c"))
    assert(r.getSeq[Long](2) == Seq(3L, 2L, 1L))
    assert(r.getSeq[String](3) == Seq("c", "b", "a"))
    assert(r.getSeq[Long](4) == Seq(30L, 20L, 10L))
    // nulls sort LAST in both directions; ties keep original order (stable)
    val r2 = run(
      """people | where id == 1
        | | extend (a, b) = array_sort_asc(dynamic(['x', '', 'x']), dynamic([1, 2, 3]))
        | | project b""".stripMargin).head
    assert(r2.getSeq[Long](0) == Seq(2L, 1L, 3L)) // '' < 'x'; the tied x's keep 1 then 3
  }

  test("parse kind=regex: raw regex chunks, typed captures, null on bad cast") {
    val r = run(
      """people
        | | extend line = strcat('u=', name, ' #', tostring(id))
        | | parse kind=regex line with 'u=' who '\s*#' num:long
        | | where id == 1 | project who, num""".stripMargin)
    assert(r.head.getString(0) == "Alice" && r.head.getLong(1) == 1L)
    // a typed capture that fails its cast comes back null (ADX contract)
    val r2 = run(
      """people | where id == 1
        | | extend line = 'v=abc'
        | | parse line with 'v=' v:long
        | | project bad = isnull(v)""".stripMargin)
    assert(r2.head.getBoolean(0))
  }

  test("toscalar bindings nest: a let scalar may reference another") {
    val r = run(
      """let mx = toscalar(people | summarize max(age));
        |let over = toscalar(people | where age == mx | count);
        |people | where age == mx | project name, n_at_max = over""".stripMargin)
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("dave", 1L))) // max age 40, exactly one person holds it
  }

  test("union isfuzzy=true skips unresolvable operands, fails when all do") {
    // source form, missing table skipped; option order with withsource free
    val r = run(
      """union isfuzzy=true withsource=src nope_not_here, people
        | | summarize n = count() by src""".stripMargin)
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("people", 5L)))
    // piped-operator form: the piped frame always survives
    val r2 = run(
      "people | union isfuzzy=true (still_missing) | count")
    assert(r2.head().getLong(0) == 5L)
    // without isfuzzy the same query must fail loudly
    intercept[Exception](run("people | union (still_missing) | count").collect())
    // all operands failing is an error even under isfuzzy
    val e = intercept[Exception](run(
      "union isfuzzy=true gone_a, gone_b | count"))
    assert(e.getMessage.contains("every operand failed"))
    // isfuzzy tolerates ONLY unresolved references: a semantic error in a
    // RESOLVABLE operand (typo'd column) still fails the whole query
    intercept[Exception](run(
      "union isfuzzy=true people, (people | where no_such_col > 1) | count").collect())
    intercept[Exception](run(
      "people | union isfuzzy=true (people | project no_such_col) | count").collect())
  }

  test("top-nested with others aggregates the raw remainder into one bucket") {
    val r = run(
      "people | top-nested 2 of age with others = 'REST' by n = count() | order by n desc, age asc")
    assert(r.collect().map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("35", 2L), ("REST", 2L), ("25", 1L))) // ages 30+40 pool into REST
    // nested form: others on the final level, per parent, no sub-breakdown
    val r2 = run(
      """people
        | | top-nested 1 of age by n1 = count(),
        |   top-nested 1 of id with others = 'X' by n2 = count()
        | | order by id asc""".stripMargin)
    assert(r2.collect().map(x => (x.getInt(0), x.getLong(1), x.getString(2), x.getLong(3))).toSeq ==
      Seq((35, 2L, "3", 1L), (35, 2L, "X", 1L)))
    intercept[IllegalArgumentException](run(
      "people | top-nested 1 of age with others = 'X' by n = count(), top-nested 1 of id by m = count()"))
  }

  test("toscalar binds a subquery value; render is identity; project-reorder rearranges") {
    val r = run("let m = toscalar(people | summarize max(age)); people | where age == m | count")
    assert(r.head().getLong(0) == 1L) // dave, age 40
    val r2 = run("let who = toscalar(people | order by score desc, id asc | project name); " +
      "people | where name == who | project id")
    assert(r2.head().getLong(0) == 2L) // bob: score 20, lowest id among the tie
    assert(run("people | render timechart | count").head().getLong(0) == 5L)
    // inline toscalar (no let) and toscalar inside a tabular let body
    assert(run("people | where age == toscalar(people | summarize max(age)) | count")
      .head().getLong(0) == 1L)
    assert(run("let older = people | where age > toscalar(people | summarize min(age)); " +
      "older | count").head().getLong(0) == 4L)
    // a literal containing the word is untouched
    assert(run("people | where name == 'toscalar(x)' | count").head().getLong(0) == 0L)
    assert(run("people | project-reorder score, name").columns.toSeq ==
      Seq("score", "name", "id", "role", "age"))
    intercept[IllegalArgumentException](run("people | project-reorder nope"))
  }

  test("runMulti: fork applies each leg to the frame-so-far") {
    val legs = KqlPipeline.runMulti(Map("people" -> people),
      "people | where age >= 30 | fork " +
        "olds = (where age >= 35 | summarize n = count()) " +
        "scores = (summarize s = sum(score))")
    assert(legs.map(_._1) == Seq("olds", "scores"))
    assert(legs(0)._2.head().getLong(0) == 3L)     // Carol, dave, Eve
    assert(legs(1)._2.head().getDouble(0) == 50.0) // 10 + 20 + 5 + 15
    // unnamed legs auto-name in order
    val anon = KqlPipeline.runMulti(Map("people" -> people),
      "people | fork (count) (where age < 30 | count)")
    assert(anon.map(_._1) == Seq("fork_1", "fork_2"))
    assert(anon(0)._2.head().getLong(0) == 5L)
    assert(anon(1)._2.head().getLong(0) == 1L)
    // fork inside run()'s one-frame contract stays a loud error
    intercept[IllegalArgumentException](run("people | fork (count)"))
  }

  test("runMulti: facet by yields per-column value counts plus the with-leg") {
    val legs = KqlPipeline.runMulti(Map("people" -> people),
      "people | facet by age, role with (summarize m = max(score))")
    assert(legs.map(_._1) == Seq("age", "role", "query"))
    val ages = legs(0)._2.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(ages == Map(25 -> 1L, 30 -> 1L, 35 -> 2L, 40 -> 1L))
    assert(legs(1)._2.count() == 5L) // five distinct role strings
    assert(legs(2)._2.head().getDouble(0) == 20.0)
  }

  test("union kind=inner keeps only the common columns; bag_pack builds a bag") {
    val r = run(
      "people | union kind=inner (depts) | project-keep role | count")
    assert(r.head().getLong(0) == 8L) // 5 people + 3 depts, role is common
    intercept[Exception](
      run("people | union kind=inner (depts) | project id | count").collect())
    val bag = run("people | where id == 1 | project b = bag_pack('n', name, 'a', age)")
      .head().getString(0)
    assert(bag == """{"n":"Alice","a":30}""")
  }

  test("runMulti: operators after the fork apply to every leg") {
    val legs = KqlPipeline.runMulti(Map("people" -> people),
      "people | fork " +
        "a = (where age >= 30 | project name, score | order by score desc | take 3) " +
        "b = (summarize s = sum(score) by role) " +
        "| count")
    // the trailing `| count` runs per leg, on each leg's own pipeline
    assert(legs.map(_._1) == Seq("a", "b"))
    assert(legs(0)._2.head().getLong(0) == 3L)
    assert(legs(1)._2.head().getLong(0) == 5L) // five distinct roles
    // and the continuation composes with facet too
    val f = KqlPipeline.runMulti(Map("people" -> people),
      "people | facet by role | where count_ > 1 | count")
    assert(f.map(_._1) == Seq("role"))
    assert(f(0)._2.head().getLong(0) == 0L) // all five roles are distinct
  }

  test("runMulti: evaluate preview returns the sample and the total count") {
    val legs = KqlPipeline.runMulti(Map("people" -> people),
      "people | where age >= 30 | evaluate preview(2)")
    assert(legs.map(_._1) == Seq("preview", "count"))
    assert(legs(0)._2.count() == 2L)
    assert(legs(0)._2.columns.toSeq == people.columns.toSeq)
    assert(legs(1)._2.head().getLong(0) == 4L)
  }

  test("invoke applies a let-bound lambda function") {
    // default parameter value
    assert(run("let adults = (T:(*), minAge:long = 30) { T | where age >= minAge }; " +
      "people | invoke adults() | count").head().getLong(0) == 4L)
    // explicit argument
    assert(run("let adults = (T:(*), minAge:long = 30) { T | where age >= minAge }; " +
      "people | invoke adults(35) | count").head().getLong(0) == 3L)
    // composes mid-pipeline with surrounding operators
    assert(run("let big = (T:(*), th:long) { T | where score >= th }; " +
      "people | where age <= 35 | invoke big(15) | count").head().getLong(0) == 3L)
    // the body may reference its tabular parameter again (union operand)
    assert(run("let dbl = (T:(*)) { T | union T }; " +
      "people | invoke dbl() | count").head().getLong(0) == 10L)
    // lambdas calling lambdas expand recursively
    assert(run("let adults = (T:(*), minAge:long = 30) { T | where age >= minAge }; " +
      "let named = (T:(*)) { T | invoke adults(35) | where name startswith 'C' }; " +
      "people | invoke named() | count").head().getLong(0) == 1L)
    // missing argument without a default, and unknown function, fail loudly
    intercept[IllegalArgumentException](run(
      "let big = (T:(*), th:long) { T | where score >= th }; people | invoke big()"))
    intercept[IllegalArgumentException](run("people | invoke nope()"))
  }

  test("find searches across tables; missing columns null-pad and never match") {
    val r = run("find withsource=src in (people, depts) " +
      "where role == 'guest' or dept == 'ops' " +
      "project src, role | order by src asc, role asc").collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq == Seq(
      ("depts", "admin role"), ("depts", "guest"), ("people", "guest")))
    // default label column is source_; `where` is mandatory
    assert(run("find in (people, depts) where role == 'user' | project source_ | distinct source_")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("depts", "people"))
    intercept[IllegalArgumentException](run("find in (people, depts) | count"))
  }

  test("parse-kv extracts typed key-values with trimming; missing keys are null") {
    val r = run("people | extend kv = strcat('a=', tostring(age), '; n=', name) " +
      "| parse-kv kv as (a:long, n:string) with (pair_delimiter=';', kv_delimiter='=') " +
      "| where a >= 35 | project n | order by n asc").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("Carol", "Eve", "dave"))
    // undeclared keys are ignored; declared-but-absent keys come back null
    val miss = run("people | extend kv = strcat('a=', tostring(age)) " +
      "| parse-kv kv as (zz:string) with (pair_delimiter=';', kv_delimiter='=') " +
      "| where isnull(zz) | count").head().getLong(0)
    assert(miss == 5L)
  }

  test("toscalar is lazy: bindings no consumed branch references never run") {
    // the poison table THROWS on resolution — if either unused let's
    // toscalar ran at bind time (the old eager behavior), this query fails
    val resolver: String => DataFrame = {
      case "people" => people
      case "poison" => throw new IllegalStateException("unused toscalar ran a job")
      case other    => fail(s"unexpected table: $other")
    }
    val r = KqlPipeline.run(resolver,
      "let unusedScalar = toscalar(poison | count); " +
        "let unusedTabular = poison | where id > toscalar(poison | count); " +
        "people | count")
    assert(r.head().getLong(0) == 5L)
  }

  test("toscalar is memoized: one subquery evaluation per distinct text") {
    // source-resolution count is the job-count proxy: each toscalar
    // evaluation compiles its sub-pipeline, resolving `people` once —
    // two textually-identical calls must share one evaluation
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val resolver: String => DataFrame = {
      case "people" => n.incrementAndGet(); people
      case other    => fail(s"unexpected table: $other")
    }
    val r = KqlPipeline.run(resolver,
      "people | where age == toscalar(people | summarize max(age)) " +
        "or score == toscalar(people | summarize max(age)) | count")
    assert(r.head().getLong(0) == 1L) // dave: age 40; no score equals 40.0… except none
    // outer pipeline resolves people once + ONE shared toscalar evaluation
    assert(n.get() == 2, s"expected 2 resolutions (memoized), got ${n.get()}")
  }

  test("mv-apply shorthand binding restores the original array after summarize") {
    // `mv-apply w on (…)` shadows column w with elements; the carried w in
    // the output must be the ORIGINAL per-row array, not an arbitrary element
    val r = run(
      """people
        | | extend w = split(role, ' ')
        | | mv-apply w on (summarize n = count())
        | | where id == 4
        | | project id, w, n""".stripMargin)
    val row = r.head()
    assert(row.getSeq[String](1) == Seq("user", "|", "guest")) // the array, restored
    assert(row.getLong(2) == 3L)
  }

  test("scalar keyword lets stay scalar; bag_unpack key collisions error loudly") {
    assert(run("let flag = true; people | where flag | count").head().getLong(0) == 5L)
    assert(run("let nothing = null; people | extend z = nothing | where isempty(z) | count")
      .head().getLong(0) == 5L)
    val e = intercept[IllegalArgumentException](run(
      """datatable (k:string, name:string) ['{"name": 7}', 'x']
        | | evaluate bag_unpack(k)""".stripMargin).collect())
    assert(e.getMessage.contains("collide") && e.getMessage.contains("name"), e.getMessage)
  }

  test("mv-apply over several arrays zips element-wise") {
    val df = Seq((1L, Seq(1, 2, 3), Seq(10.0, 20.0, 30.0))).toDF("id", "q", "p")
    // revenue per row = Σ q[i]*p[i] over PAIRED elements (not a cross)
    val r = KqlPipeline.run(Map("t" -> df),
      """t | mv-apply qe = q, pe = p on (
        |     extend v = qe * pe
        |   | summarize rev = sum(v))""".stripMargin)
    assert(r.columns.toSeq == Seq("id", "q", "p", "rev"))
    assert(r.head().getDouble(3) == 140.0) // 10 + 40 + 90
  }

  test("mv-apply runs a per-row subquery over array elements") {
    val r = run(
      """people
        | | extend w = split(role, ' ')
        | | mv-apply t = w on (where strlen(t) > 4 | summarize n_big = count(), top_t = max(t))
        | | project id, n_big, top_t | order by id asc""".stripMargin)
    // role words >4 chars: id1 [admin? no: 'admin' is 5>4 yes, 'role' no] →
    // id1: admin(5)→1; id2 user(4)→none (row drops); id3 ADMIN→1;
    // id4 'user | guest': user(4) no, |(0) no, guest(5) yes →1; id5 guest→1
    assert(r.collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq ==
      Seq((1L, 1L, "admin"), (3L, 1L, "ADMIN"), (4L, 1L, "guest"), (5L, 1L, "guest")))
  }

  test("mv-apply without summarize yields the staged exploded rows; by-keys group per element value") {
    val flat = run(
      "people | extend w = split(role, ' ') | mv-apply t = w on (where t == 'user') | count")
    assert(flat.head().getLong(0) == 2L) // id2, id4

    val byK = run(
      """people | extend w = split(role, ' ')
        | | mv-apply t = w on (summarize n = count() by t)
        | | where t == 'guest' | summarize rows = count(), total = sum(n)""".stripMargin)
    assert(byK.head().getLong(0) == 2L) // guest appears for id4 and id5
    assert(byK.head().getLong(1) == 2L)
  }

  test("as binds the frame-so-far; join hint.strategy=broadcast broadcasts the right side") {
    val r = run(
      """people | where age >= 30 | as grown
        | | join kind=inner hint.strategy=broadcast (grown | summarize m = max(score)) on $left.score == $right.m
        | | project name""".stripMargin)
    assert(r.collect().map(_.getString(0)).toSet == Set("Carol"))
    val plan = run(
      "people | join hint.strategy=broadcast (depts) on role").queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("materialize() in a tabular let is plan-identical") {
    val r = run(
      """let hot = materialize(people | where score >= 15.0);
        |hot | join kind=inner (hot) on id | count""".stripMargin)
    assert(r.head().getLong(0) == 3L)
  }

  test("top-hitters: exact heavy hitters with ADX column names") {
    val r = run("people | top-hitters 2 of age")
    assert(r.columns.toSeq == Seq("age", "approximate_count_age"))
    assert(r.head().getInt(0) == 35) // the only age with 2 people
    val s = run("people | top-hitters 1 of role by score")
    assert(s.columns.toSeq == Seq("role", "approximate_sum_score"))
    assert(s.head().getString(0) == "ADMIN") // 20.0 is the max single-role sum tie → ADMIN first asc
  }

  test("sample and sample-distinct are deterministic and bounded") {
    val a = run("people | sample 3 | project id").collect().map(_.getLong(0)).toSeq
    val b = run("people | sample 3 | project id").collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 3)
    val d = run("people | sample-distinct 2 of age").collect().map(_.getInt(0)).toSeq
    assert(d.size == 2 && d.distinct.size == 2)
  }

  test("array scalars: array_index_of, set_intersect, array_sum, indexof, extract_all") {
    val r = run(
      """print s = 'a b c', t = 'x-1 y-2'
        | | extend arr = split(s, ' '), brr = split('b c d', ' ')
        | | extend pos = array_index_of(arr, 'b'), missing = array_index_of(arr, 'z'),
        |          both = set_intersect(arr, brr), tot = array_sum(split('1 2 3', ' ')),
        |          ix = indexof(s, 'b'), nums = extract_all('([0-9]+)', t)""".stripMargin)
    val row = r.head()
    assert(row.getLong(r.schema.fieldIndex("pos")) == 1L)
    assert(row.getLong(r.schema.fieldIndex("missing")) == -1L)
    assert(row.getSeq[String](r.schema.fieldIndex("both")) == Seq("b", "c"))
    assert(row.getDouble(r.schema.fieldIndex("tot")) == 6.0)
    assert(row.getInt(r.schema.fieldIndex("ix")) == 2)
    assert(row.getSeq[String](r.schema.fieldIndex("nums")) == Seq("1", "2"))
  }

  test("stateful KQL on a stream: summarize by bin() is a streaming aggregation") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions.col
    val src = tmpDir("kql-stream-agg-src"); val ckpt = tmpDir("kql-stream-agg-ckpt")
    // minute-spread epoch-nano events
    val ev = Seq((0L, "a"), (30_000_000_000L, "a"), (90_000_000_000L, "b"))
      .toDF("ts", "kind")
    ev.write.mode("append").parquet(src)
    val stream = spark.readStream.schema(ev.schema).parquet(src)
    val q = KqlPipeline.run(Map("ev" -> stream),
        "ev | summarize n = count() by b = bin(ts, 60000000000), kind")
      .writeStream.format("memory").queryName("kql_stream_agg")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("kql_stream_agg").collect()
      .map(r => (r.getLong(r.fieldIndex("b")), r.getString(r.fieldIndex("kind")),
        r.getLong(r.fieldIndex("n")))).sorted.toSeq
    assert(rows == Seq((0L, "a", 2L), (60_000_000_000L, "b", 1L)))
  }

  test("row_cumsum is a running sum in the sorted order") {
    val r = run(
      """people | order by id asc | serialize
        | | extend c = row_cumsum(age) | project id, c""".stripMargin)
    assert(r.orderBy("id").collect().map(_.getLong(1)).toSeq ==
      Seq(30L, 55L, 90L, 130L, 165L))
  }

  test(".show tables lists the catalog and composes with the pipeline") {
    val r = run(".show tables | order by TableName asc")
    assert(r.columns.toSeq == Seq("TableName"))
    assert(r.collect().map(_.getString(0)).toSeq == Seq("depts", "people"))
    // the reference's existence probe shape
    val c = run(".show tables | where TableName == 'people' | count")
    assert(c.head().getLong(0) == 1L)
    intercept[IllegalArgumentException](run(".drop table people"))
  }

  test("partition by (top N by …) keeps the per-group top-k") {
    val r = run(
      """people | partition by age (top 1 by score desc, id asc)
        | | where age == 35 | project name""".stripMargin)
    assert(r.collect().map(_.getString(0)).toSeq == Seq("Carol")) // 20.0 beats 15.0
    // summarize is now a supported sub-pipeline stage (keyed group-by);
    // per-key nondeterministic stages still reject
    intercept[IllegalArgumentException](
      run("people | partition by age (take 2)"))
  }

  test("count_distinct[if] and make_list_with_nulls (nulls preserved)") {
    val r = run(
      """people
        | | summarize cd = count_distinct(age),
        |     cdi = count_distinctif(age, score > 10.0)""".stripMargin).head
    assert(r.getLong(0) == 4L)       // ages 25, 30, 35, 40
    assert(r.getLong(1) == 2L)       // score > 10: ages 25(20.0)? check below
    val withNull = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "v")
    val r2 = KqlPipeline.run(Map("t" -> withNull),
      "t | summarize l = make_list_with_nulls(v), plain = make_list(v)").head
    assert(r2.getSeq[String](0).size == 3)  // null kept
    assert(r2.getSeq[String](0).count(_ == null) == 1)
    assert(r2.getSeq[String](1).size == 2)  // collect_list drops it
  }

  test("bag_unpack spreads a JSON bag into typed columns") {
    val logs = Seq((1L, """{"a": 1, "b": "x"}"""), (2L, """{"a": 2}"""))
      .toDF("id", "bag")
    val r = KqlPipeline.run(Map("logs" -> logs),
      "logs | evaluate bag_unpack(bag) | order by id asc")
    assert(r.columns.toSeq == Seq("id", "a", "b"))
    val rows = r.collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(Option(rows(1).getString(2)).isEmpty) // missing key → null
  }

  test("weighted percentile, bit aggregates, take_any, make_set_if, series fills") {
    val r = run(
      """people
        | | summarize pw = percentilew(age, id, 50), all_and = binary_all_and(age),
        |             all_or = binary_all_or(age), one = take_any(score),
        |             grown = make_set_if(name, age >= 35)""".stripMargin)
    val row = r.head()
    assert(row.getDouble(0) > 25.0 && row.getDouble(0) <= 40.0)
    assert(row.getInt(1) == (30 & 25 & 35 & 40 & 35))
    assert(row.getInt(2) == (30 | 25 | 35 | 40 | 35))
    assert(!row.isNullAt(3))
    assert(row.getSeq[String](4).sorted == Seq("Carol", "Eve", "dave").sorted)

    val f = run(
      """print a = array(1.0, cast(null as double), 3.0, cast(null as double))
        | | project fwd = series_fill_forward(a), back = series_fill_backward(a)""".stripMargin)
    assert(f.head().getSeq[Double](0) == Seq(1.0, 1.0, 3.0, 3.0))
    // trailing null has no successor to fill from → stays null
    assert(f.head().getSeq[java.lang.Double](1).toSeq ==
      Seq[java.lang.Double](1.0, 3.0, 3.0, null))
  }

  test("extractjson evaluates a JSON path via get_json_object") {
    val logs = Seq((1L, """{"user": {"id": 7}}"""), (2L, """{"user": {"id": 9}}"""))
      .toDF("id", "payload")
    val r = KqlPipeline.run(Map("logs" -> logs),
      "logs | extend uid = tolong(extractjson('$.user.id', payload)) | summarize s = sum(uid)")
    assert(r.head().getLong(0) == 16L)
  }

  test("prev/next shift rows in the sorted order") {
    val r = run(
      """people | order by id asc | serialize
        | | extend p = prev(name), nx = next(name) | project id, p, nx""".stripMargin)
    val rows = r.orderBy("id").collect()
      .map(x => (x.getLong(0), Option(x.getString(1)), Option(x.getString(2)))).toSeq
    assert(rows.head == ((1L, None, Some("bob"))))
    assert(rows(2) == ((3L, Some("bob"), Some("dave"))))
    assert(rows.last == ((5L, Some("dave"), None)))
  }

  test("summarize arg_max(ord, *) returns the whole maximizing row per group") {
    val r = run("people | summarize arg_max(score, *) by age | order by age asc")
    assert(r.columns.toSeq == Seq("age", "id", "name", "role", "score"))
    val m = r.collect().map(x => x.getInt(0) -> x.getString(2)).toMap
    assert(m(35) == "Carol") // 20.0 beats Eve's 15.0
    assert(m(40) == "dave")
  }

  test("the reference's status-view shape runs unchanged: externaldata csv + arg_max(ts, *)") {
    val dir = tmpDir("kql-statusview")
    val csv = new java.io.File(dir, "index.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("KustoTableName,StartTxId,Action,BlobPath,State,MirrorTimestamp")
    w.println("t1,1,Add,blob/a,Staged,2024-01-01 00:00:00")
    w.println("t1,1,Add,blob/a,Done,2024-01-01 00:05:00")
    w.println("t1,2,Add,blob/b,Queued,2024-01-01 00:01:00")
    w.println("t2,1,Remove,blob/c,Done,2024-01-01 00:02:00")
    w.close()
    val r = KqlPipeline.run(Map.empty[String, DataFrame],
      s"""externaldata (KustoTableName:string, StartTxId:long, Action:string,
         |  BlobPath:string, State:string, MirrorTimestamp:datetime)
         |  ['${csv.getAbsolutePath}'] with (format='csv', ignoreFirstRecord=true)
         | | summarize arg_max(MirrorTimestamp, *)
         |   by KustoTableName, StartTxId, Action, BlobPath
         | | order by KustoTableName asc, StartTxId asc, Action asc, BlobPath asc
         | | project KustoTableName, StartTxId, State""".stripMargin)
    assert(r.collect().map(x => (x.getString(0), x.getLong(1), x.getString(2))).toSeq ==
      Seq(("t1", 1L, "Done"), ("t1", 2L, "Queued"), ("t2", 1L, "Done")))
  }

  test("new scalar spellings: iif, strcat_delim, tohex, format_datetime, bin_at, getyear") {
    val r = run(
      """print t = datetime(2024-03-15), n = 255
        | | extend y = getyear(t), d = format_datetime(t, 'yyyy-MM'),
        |          hx = tohex(n), joined = strcat_delim('-', 'a', 'b'),
        |          b = bin_at(37, 10, 2), alt = iif(1 == 1, 'y', 'n')""".stripMargin)
    val row = r.head()
    assert(row.getInt(r.schema.fieldIndex("y")) == 2024)
    assert(row.getString(r.schema.fieldIndex("d")) == "2024-03")
    assert(row.getString(r.schema.fieldIndex("hx")) == "ff")
    assert(row.getString(r.schema.fieldIndex("joined")) == "a-b")
    assert(row.getLong(r.schema.fieldIndex("b")) == 32L)
    assert(row.getString(r.schema.fieldIndex("alt")) == "y")
  }

  test("pack_all serializes the whole row as a JSON bag") {
    val r = run(
      """datatable (a:long, b:string) [ 1, 'x' ]
        | | extend bag = pack_all()
        | | project bag""".stripMargin)
    assert(r.head().getString(0) == """{"a":1,"b":"x"}""")
  }

  test("rows_near keeps the context window around condition rows") {
    val r = run(
      """datatable (i:long, t:string) [
        |   1, 'a', 2, 'a', 3, 'X', 4, 'a', 5, 'a', 6, 'a', 7, 'X', 8, 'a' ]
        | | evaluate rows_near(t == 'X', 1)
        | | project i""".stripMargin)
    // X at 3 and 7: keep 2,3,4 and 6,7,8 (1 before + 1 after each)
    assert(r.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L, 6L, 7L, 8L))
    val asym = run(
      """datatable (i:long, t:string) [
        |   1, 'a', 2, 'a', 3, 'X', 4, 'a', 5, 'a', 6, 'a' ]
        | | evaluate rows_near(t == 'X', 0, 2)
        | | project i""".stripMargin)
    // 0 before, 2 after → 3,4,5
    assert(asym.collect().map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
  }

  test("dcount_intersect: inclusion-exclusion over 2 and 3 hll sketches") {
    // sets A = {1..40}, B = {21..60}, C = {31..70}:
    // |A∩B| = 20, |A∩B∩C| = 10 — at these cardinalities the HLL sketch is
    // in its near-exact regime, so the estimates land on the nose
    val r = run(
      """range x from 1 to 120 step 1
        | | extend s = iif(x <= 40, 'a', iif(x <= 80, 'b', 'c')),
        |          v = iif(x <= 40, x, iif(x <= 80, x - 20, x - 50))
        | | summarize ha = hll(iif(s == 'a', v, tolong(null))),
        |             hb = hll(iif(s == 'b', v, tolong(null))),
        |             hc = hll(iif(s == 'c', v, tolong(null)))
        | | evaluate dcount_intersect(ha, hb, hc)""".stripMargin)
    val row = r.head()
    assert(row.getLong(r.schema.fieldIndex("s0")) == 40L)
    assert(row.getLong(r.schema.fieldIndex("s1")) == 20L)
    assert(row.getLong(r.schema.fieldIndex("s2")) == 10L)
    assert(!r.columns.contains("ha"))
  }

  test("global serialized prev/next with offset and default") {
    val r = run(
      """datatable (i:long) [ 10, 20, 30, 40, 50 ]
        | | order by i asc
        | | extend p2 = prev(i, 2, -1), n2 = next(i, 2, -1), p1 = prev(i)
        | | project i, p2, n2, p1""".stripMargin)
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
      if (x.isNullAt(3)) -99L else x.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (10L, -1L, 30L, -99L), (20L, -1L, 40L, 10L), (30L, 10L, 50L, 20L),
      (40L, 20L, -1L, 30L), (50L, 30L, -1L, 40L)))
  }

  test("row_number with restart resets the index at segment boundaries") {
    val r = run(
      """datatable (i:long, g:string) [
        |   1, 'a', 2, 'a', 3, 'b', 4, 'b', 5, 'b', 6, 'c' ]
        | | order by i asc
        | | extend pg = prev(g, 1, '')
        | | extend rn = row_number(1, g != pg)
        | | project i, rn""".stripMargin)
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    // first row: g != '' → restart (index 1); then 2; 'b' restarts; 'c' restarts
    assert(got.toSeq == Seq(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 1L))
  }

  test("mv-expand limit caps expanded rows per input row") {
    val r = run(
      """datatable (k:long) [ 1 ]
        | | extend a = dynamic([10, 20, 30, 40, 50])
        | | mv-expand a limit 3
        | | project a""".stripMargin)
    assert(r.collect().map(_.getAs[Number](0).longValue).toSeq == Seq(10L, 20L, 30L))
    val withIdx = run(
      """datatable (k:long) [ 1 ]
        | | extend a = dynamic([10, 20, 30])
        | | mv-expand with_itemindex = ix a limit 2
        | | project ix, a""".stripMargin)
    assert(withIdx.collect().map(x =>
      (x.getAs[Number](0).longValue, x.getAs[Number](1).longValue)).toSeq ==
      Seq(0L -> 10L, 1L -> 20L))
  }

  test("parse_json/todynamic are identity on the JSON-text dynamic currency; indexof start") {
    val r = run(
      """print b = parse_json('{"a": 1}')
        | | project v = extractjson('$.a', b),
        |     w = extractjson('$.a', todynamic(bag_pack('a', 7))),
        |     ix = indexof('abcabc', 'bc', 2)""".stripMargin)
    val row = r.head()
    assert(row.getString(0) == "1")
    assert(row.getString(1) == "7")
    assert(row.getAs[Number](2).longValue == 4L)
  }

  test("make-series auto-range deduces the axis from the data") {
    val r = run(
      """datatable (t:long, v:long) [ 5, 1, 12, 1, 23, 1, 25, 1 ]
        | | make-series n = count() on t step 10
        | | project n_json = to_json(n)""".stripMargin)
    // min 5 → from 0; max 25 → to 30; bins [0,10,20] → counts [1,1,2]
    assert(r.head().getString(0) == "[1,1,2]")
  }

  test("column_ifexists resolves present columns and falls back for missing ones") {
    val r = run(
      """people
        | | extend a = column_ifexists(name, 'zz'), b = column_ifexists(nope, 'zz'),
        |     c = column_ifexists('score', -1.0)
        | | where column_ifexists(id, 0) == 1
        | | project a, b, c""".stripMargin)
    val row = r.head()
    assert(row.getString(0) == "Alice")
    assert(row.getString(1) == "zz")
    assert(row.getDouble(2) == 10.0)
  }

  test("consume returns no rows but preserves the schema") {
    val r = run("people | where age >= 30 | consume")
    assert(r.columns.toSeq == people.columns.toSeq)
    assert(r.count() == 0L)
  }

  test("row_window_session: idle gap, max-from-first, and restart cuts") {
    // ts in abstract nanos; idle cut at > 10, max-from-first cut at > 25
    val r = run(
      """datatable (ts:long, mark:bool) [
        |   0, false, 5, false, 12, false, 20, false, 28, false,
        |   100, false, 105, true, 109, false ]
        | | order by ts asc
        | | extend ss = row_window_session(ts, 25, 10, mark)
        | | project ts, ss""".stripMargin)
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    // 0,5,12,20 share start 0 (gaps ≤10, span ≤25); 28−0 > 25 → new start;
    // 100 after a 72 idle gap → new; 105 restarts by mark; 109 rides along
    assert(got.toSeq == Seq(0L -> 0L, 5L -> 0L, 12L -> 0L, 20L -> 0L,
      28L -> 28L, 100L -> 100L, 105L -> 105L, 109L -> 105L))
  }
}
