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

  private def run(kql: String): DataFrame =
    KqlPipeline.run(Map("people" -> people), kql)

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

  test("project-away drops columns") {
    assert(run("people | project-away role, score").columns.toSeq ==
      Seq("id", "name", "age"))
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
    intercept[IllegalArgumentException](run("people | mv-expand role"))
    intercept[IllegalArgumentException](run("people | summarize median(age)"))
    intercept[IllegalArgumentException](run("people | extend score * 2"))
    intercept[IllegalArgumentException](KqlPipeline.run(Map.empty[String, DataFrame], "people x | count"))
  }

  test("make_set is sorted (deterministic) and make_list collects") {
    val r = run("people | summarize ages = make_set(age) by score | where score == 20.0")
    assert(r.head().getSeq[Int](1).sorted == r.head().getSeq[Int](1))
  }
}
