package graft.kql

import graft.SparkSuite

/** evaluate narrow/basket, reduce by, and the IPv4/digest scalar tail. */
class KqlPluginsSpec extends SparkSuite {

  private def run(kql: String, tables: Map[String, org.apache.spark.sql.DataFrame] = Map.empty) = {
    spark.sparkContext // force the shared session active before source-only pipelines
    KqlPipeline.run(tables, kql)
  }

  test("evaluate narrow: (Row, Column, Value) strings in current order") {
    val out = run(
      """datatable (k:long, s:string) [ 2, 'b', 1, 'a' ]
        | | order by k asc
        | | evaluate narrow()
        | | order by Row asc, Column asc""".stripMargin)
    assert(out.columns.toSeq == Seq("Row", "Column", "Value"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(
      (0L, "k", "1"), (0L, "s", "a"),
      (1L, "k", "2"), (1L, "s", "b")))
  }

  test("evaluate basket: cube itemsets above support, no empty itemset") {
    val out = run(
      """datatable (a:string, b:string) [
        |   'x', 'p',  'x', 'p',  'x', 'q',  'y', 'q'
        | ]
        | | evaluate basket(0.5)
        | | order by Count desc, a asc, b asc""".stripMargin)
    val rows = out.collect().map(r =>
      (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getDouble(3))).toSeq
    // support >= 2 of 4 rows: {a=x}:3, {b=p}:2, {b=q}:2, {a=x,b=p}:2
    assert(rows == Seq(
      (Some("x"), None, 3L, 75.0),
      (None, Some("p"), 2L, 50.0),
      (None, Some("q"), 2L, 50.0),
      (Some("x"), Some("p"), 2L, 50.0)))
  }

  test("reduce by: digit runs generalize to *, min representative, threshold") {
    val out = run(
      """datatable (s:string) [
        |   'err-17', 'err-3', 'err-99', 'ok-1', 'warn'
        | ]
        | | reduce by s
        | | order by Count desc, Pattern asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows == Seq(
      ("err-*", 3L, "err-17"),
      ("ok-*", 1L, "ok-1"),
      ("warn", 1L, "warn")))

    val thresholded = run(
      """datatable (s:string) [
        |   'err-17', 'err-3', 'err-99', 'ok-1', 'warn'
        | ]
        | | reduce by s with threshold = 0.5""".stripMargin)
    assert(thresholded.collect().map(_.getString(0)).toSeq == Seq("err-*"))
  }

  test("parse_ipv4 / format_ipv4 / ranges / privacy") {
    val out = run(
      """datatable (ip:string) [ '10.1.2.3', '8.8.8.8', 'nope', '300.1.1.1' ]
        | | extend n = parse_ipv4(ip), p = ipv4_is_private(ip),
        |     r = ipv4_is_in_range(ip, '10.1.2.0/24'), f = format_ipv4(parse_ipv4(ip))
        | | order by ip asc""".stripMargin)
    val byIp = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byIp("10.1.2.3").getLong(1) == 10L * 16777216 + 1 * 65536 + 2 * 256 + 3)
    assert(byIp("10.1.2.3").getBoolean(2) && byIp("10.1.2.3").getBoolean(3))
    assert(byIp("10.1.2.3").getString(4) == "10.1.2.3")
    assert(byIp("8.8.8.8").getLong(1) == 134744072L)
    assert(!byIp("8.8.8.8").getBoolean(2) && !byIp("8.8.8.8").getBoolean(3))
    assert(byIp("nope").isNullAt(1) && byIp("300.1.1.1").isNullAt(1))
  }

  test("digest + base64 round-trip") {
    val out = run(
      """print x = 'abc'
        | | extend h256 = hash_sha256(x), hm = hash_md5(x),
        |     b = base64_encode_tostring(x), rb = base64_decode_tostring(base64_encode_tostring(x))""".stripMargin)
    val r = out.head()
    assert(r.getAs[String]("h256") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(r.getAs[String]("hm") == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getAs[String]("b") == "YWJj" && r.getAs[String]("rb") == "abc")
  }
}
