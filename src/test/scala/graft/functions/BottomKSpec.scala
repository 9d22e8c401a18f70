package graft.functions

import graft.SparkSuite
import graft.functions.expressions.BottomKOps

/** Bottom-k sampling sketch: determinism, insert-order independence,
  * two-level merge equivalence, and the bounded-size invariant.
  */
class BottomKSpec extends SparkSuite {

  import spark.implicits._

  private def valuesOf(json: String): Seq[String] =
    if (json == "[]") Seq.empty
    else json.stripPrefix("[").stripSuffix("]").split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))

  test("flat build equals grouped build + merge (two-level contract)") {
    val df = (1 to 500).map(i => (i % 7, s"v$i")).toDF("g", "v")
    df.createOrReplaceTempView("bk_in")
    val flat = spark.sql(
      "SELECT bottomk_values(sample_bottomk(v, 10)) AS s FROM bk_in")
      .as[String].head()
    val rolled = spark.sql(
      """SELECT bottomk_values(sample_bottomk_merge(sk)) AS s FROM
        |  (SELECT sample_bottomk(v, 10) AS sk FROM bk_in GROUP BY g)""".stripMargin)
      .as[String].head()
    assert(flat == rolled)
    assert(valuesOf(flat).size == 10)
  }

  test("insert order never changes the sample") {
    val vals = (1 to 200).map(i => s"item-$i")
    val a = vals.toDF("v");    a.createOrReplaceTempView("bk_a")
    val b = vals.reverse.toDF("v"); b.createOrReplaceTempView("bk_b")
    val sa = spark.sql("SELECT bottomk_values(sample_bottomk(v, 5)) s FROM bk_a").as[String].head()
    val sb = spark.sql("SELECT bottomk_values(sample_bottomk(v, 5)) s FROM bk_b").as[String].head()
    assert(sa == sb)
    // and it really is the bottom-k by md5 of the distinct domain
    val expect = vals.distinct.sortBy(BottomKOps.md5Hex).take(5)
    assert(valuesOf(sa) == expect)
  }

  test("duplicates collapse: the sample is over DISTINCT values") {
    val df = (1 to 100).flatMap(i => Seq.fill(3)(s"d${i % 9}")).toDF("v")
    df.createOrReplaceTempView("bk_dup")
    val s = spark.sql("SELECT bottomk_values(sample_bottomk(v, 20)) s FROM bk_dup")
      .as[String].head()
    val got = valuesOf(s)
    assert(got.size == 9)           // only 9 distinct values exist
    assert(got.distinct.size == 9)
  }

  test("fewer distincts than k emits them all; nulls are skipped") {
    val df = Seq(Some("x"), None, Some("y"), Some("x"), None).toDF("v")
    df.createOrReplaceTempView("bk_nulls")
    val s = spark.sql("SELECT bottomk_values(sample_bottomk(v, 8)) s FROM bk_nulls")
      .as[String].head()
    assert(valuesOf(s).sorted == Seq("x", "y"))
  }

  test("quotes and backslashes escape like freq_topk") {
    val df = Seq("""a"b""", """c\d""").toDF("v")
    df.createOrReplaceTempView("bk_esc")
    val s = spark.sql("SELECT bottomk_values(sample_bottomk(v, 8)) s FROM bk_esc")
      .as[String].head()
    assert(s.contains("a\\\"b") && s.contains("c\\\\d"))
  }

  test("serialization round-trips the buffer exactly") {
    val b = new BottomKOps.BkBuf(3)
    Seq("p", "q", "r", "s", "t").foreach(v => b.insert(BottomKOps.md5Hex(v), v))
    val back = BottomKOps.fromBytes(BottomKOps.toBytes(b))
    assert(back.k == 3 && back.m == b.m && b.m.size == 3)
  }
}
