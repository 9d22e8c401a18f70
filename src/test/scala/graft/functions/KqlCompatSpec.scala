package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class KqlCompatSpec extends SparkSuite {
  import spark.implicits._

  test("rewrite handles the reference's default creation-time expression") {
    // ElectricTestBase.cs:13
    val out = KqlCompat.rewrite("todatetime(strcat(p0,'-01-01'))")
    assert(out == "try_to_timestamp(concat(p0,'-01-01'))")
    val r = Seq("2021").toDF("p0").withColumn("ct", expr(out)).head
    assert(r.getTimestamp(1).toString.startsWith("2021-01-01"))
  }

  test("now() and bare timespan arithmetic rewrite to timestamp intervals") {
    assert(KqlCompat.rewrite("now()") == "current_timestamp()")
    assert(KqlCompat.rewrite("ts + 1d") == "ts + interval '1' day")
    assert(KqlCompat.rewrite("t > 12h and u < 30m") ==
      "t > interval '12' hour and u < interval '30' minute")
    // bin/ago consume their own timespan args FIRST — unaffected
    assert(KqlCompat.rewrite("bin(ts, 15m)").contains("/ 900"))
    assert(KqlCompat.rewrite("ago(1d)").contains("interval '1' day"))
    // literals, identifiers and plain numbers stay untouched
    assert(KqlCompat.rewrite("x == '1d'") == "x == '1d'")
    assert(KqlCompat.rewrite("x1d + 5") == "x1d + 5")
    val r = Seq(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")).toDF("t")
      .selectExpr(KqlCompat.rewrite("t - 1d")).head
    assert(r.getTimestamp(0).toString.startsWith("2024-01-01"))
  }

  test("datetime_add, dayofweek (timespan result), endof* periods") {
    val r = Seq(java.sql.Timestamp.valueOf("2024-01-07 10:30:00")).toDF("t") // a Sunday
      .selectExpr(
        KqlCompat.rewrite("datetime_add('day', 3, t)"),
        KqlCompat.rewrite("dayofweek(t) == 0d"),
        KqlCompat.rewrite("endofmonth(t)"),
        KqlCompat.rewrite("endofday(t)"))
      .head
    assert(r.getTimestamp(0).toString.startsWith("2024-01-10"))
    assert(r.getBoolean(1)) // Sunday == 0d, the ADX timespan convention
    assert(r.getTimestamp(2).toString.startsWith("2024-01-31 23:59:59.999999"))
    assert(r.getTimestamp(3).toString.startsWith("2024-01-07 23:59:59.999999"))
  }

  test("to* conversions yield null on failure (ADX contract), never an ANSI error") {
    val r = Seq(("abc", "2021-01-01", "nope")).toDF("a", "b", "c")
      .selectExpr(
        KqlCompat.rewrite("toint(a)"),
        KqlCompat.rewrite("todatetime(b)"),
        KqlCompat.rewrite("todatetime(c)"),
        KqlCompat.rewrite("tolong(a)"),
        KqlCompat.rewrite("todouble(a)"))
      .head
    assert(r.isNullAt(0) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getTimestamp(1).toString.startsWith("2021-01-01"))
  }

  test("rewrite handles casts, datetime literals, iff and passthrough") {
    assert(KqlCompat.rewrite("toint(tostring(x))") == "try_cast(cast(x as string) as int)")
    assert(KqlCompat.rewrite("datetime(2021-06-01)") == "timestamp'2021-06-01'")
    assert(KqlCompat.rewrite("iff(a > 1, 'x', 'y')") == "if(a > 1, 'x', 'y')")
    // Spark-SQL-native input untouched
    val native = "to_timestamp(concat(cast(p0 as string), '-01-01'))"
    assert(KqlCompat.rewrite(native) == native)
  }

  test("rewrite handles bin/ago/startof*/isempty/string helpers") {
    assert(KqlCompat.rewrite("bin(x, 100)") == "(floor((x)/(100))*(100))")
    assert(KqlCompat.rewrite("bin(ts, 15m)") ==
      "timestamp_seconds(floor(cast(cast((ts) as timestamp) as double) / 900) * 900)")
    assert(KqlCompat.rewrite("ago(7d)")
      == "(current_timestamp() - interval '7' day)")
    assert(KqlCompat.rewrite("startofday(ts)") == "date_trunc('DAY', ts)")
    assert(KqlCompat.rewrite("isempty(x)") == "(coalesce(cast((x) as string), '') = '')")
    assert(KqlCompat.rewrite("strlen(tolower(s))") == "length(lower(s))")
    assert(KqlCompat.rewrite("replace_string(s, 'a', 'b')") == "replace(s, 'a', 'b')")
    assert(KqlCompat.rewrite("tobool(x)") == "try_cast(x as boolean)")
    // quoted commas/parens are opaque to the arg splitter
    assert(KqlCompat.rewrite("bin(strlen('a,b)'), 10)")
      == "(floor((length('a,b)'))/(10))*(10))")
    // Spark's own 1-arg bin() (binary representation) is NOT rewritten
    assert(KqlCompat.rewrite("bin(13)") == "bin(13)")

    // identifier boundaries: names embedded in longer identifiers survive
    assert(KqlCompat.rewrite("my_strcat(a, b)") == "my_strcat(a, b)")
    assert(KqlCompat.rewrite("sdiff(a, b)") == "sdiff(a, b)")
    assert(KqlCompat.rewrite("xstrlen(s)") == "xstrlen(s)")
    // string literals are opaque to every rewrite stage
    assert(KqlCompat.rewrite("concat('iff(', x)") == "concat('iff(', x)")
    assert(KqlCompat.rewrite("'isempty(a)'") == "'isempty(a)'")
    assert(KqlCompat.rewrite("concat('strcat(1d)', tostring(x))")
      == "concat('strcat(1d)', cast(x as string))")

    // evaluate through expr(): numeric bin and timespan bin
    val r = Seq((1234L, "2021-06-15 13:47:21")).toDF("v", "t")
      .withColumn("ts", $"t".cast("timestamp"))
      .selectExpr(
        KqlCompat.rewrite("bin(v, 100)") + " as b",
        KqlCompat.rewrite("bin(ts, 1h)") + " as h",
        KqlCompat.rewrite("startofday(ts)") + " as d")
      .head
    assert(r.getAs[Any]("b").toString.toDouble == 1200.0)
    assert(r.getAs[java.sql.Timestamp]("h").toString == "2021-06-15 13:00:00.0")
    assert(r.getAs[java.sql.Timestamp]("d").toString == "2021-06-15 00:00:00.0")
  }

  test("rewrite handles case/countof/split-index/extract/datetime_diff") {
    assert(KqlCompat.rewrite("case(a > 1, 'x', b > 2, 'y', 'z')") ==
      "(CASE WHEN (a > 1) THEN ('x') WHEN (b > 2) THEN ('y') ELSE ('z') END)")
    // even arity is not KQL case() — left untouched
    assert(KqlCompat.rewrite("case(a, b)") == "case(a, b)")
    assert(KqlCompat.rewrite("split(s, '-', 0)") == "get(split(s, '-'), 0)")
    assert(KqlCompat.rewrite("split(s, '-')") == "split(s, '-')")
    assert(KqlCompat.rewrite("extract('([0-9]+)', 1, s)") ==
      "regexp_extract(s, '([0-9]+)', 1)")
    // boundary-crossing semantics: both operands unit-truncated (r14 fuzz)
    assert(KqlCompat.rewrite("datetime_diff('day', a, b)") ==
      "timestampdiff(DAY, date_trunc('DAY', b), date_trunc('DAY', a))")
    assert(KqlCompat.rewrite("datetime_diff('week', a, b)") ==
      "timestampdiff(WEEK, (date_trunc('WEEK', (b) + interval '1' day) - interval '1' day), " +
        "(date_trunc('WEEK', (a) + interval '1' day) - interval '1' day))")

    // evaluate through expr(): 0-based split index, NULL out of bounds, and
    // occurrence counting
    val r = Seq(("a-b-c", "banana")).toDF("s", "t").selectExpr(
      KqlCompat.rewrite("split(s, '-', 0)") + " as first",
      KqlCompat.rewrite("split(s, '-', 2)") + " as last",
      KqlCompat.rewrite("split(s, '-', 9)") + " as oob",
      KqlCompat.rewrite("countof(t, 'an')") + " as n",
      KqlCompat.rewrite("case(strlen(t) > 5, 'long', 'short')") + " as band").head
    assert(r.getString(0) == "a" && r.getString(1) == "c")
    assert(r.isNullAt(2))
    assert(r.getLong(3) == 2L)
    assert(r.getString(4) == "long")

    // plain-text countof counts OVERLAPPING matches per the ADX docs
    // (countof('aaa','aa') = 2); regex matches don't overlap. The engine
    // takes the cheap replace() path only for self-overlap-free literals.
    val o = spark.range(1).selectExpr(
      KqlCompat.rewrite("countof('aaa', 'aa')") + " as a",
      KqlCompat.rewrite("countof('zzzzzz', 'zz')") + " as b",
      KqlCompat.rewrite("countof('a', 'aa')") + " as short",
      KqlCompat.rewrite("countof('aaa', 'aa', 'normal')") + " as c",
      KqlCompat.rewrite("countof('aaa', 'a+', 'regex')") + " as re").head
    assert(o.getLong(0) == 2L, s"overlapping countof: ${o.getLong(0)}")
    assert(o.getLong(1) == 5L, s"overlapping countof: ${o.getLong(1)}")
    assert(o.getLong(2) == 0L, "needle longer than text must be 0")
    assert(o.getLong(3) == 2L)
    assert(o.getLong(4) == 1L, "regex matches don't overlap")
  }

  test("dynamic-array scalar tail: rotate/shift/iff/jaccard edge cases") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("array_rotate_left(dynamic([1, 2, 3, 4]), 5)") + " as rl5",
      KqlCompat.rewrite("array_rotate_right(dynamic([1, 2, 3, 4]), 1)") + " as rr1",
      KqlCompat.rewrite("array_shift_left(dynamic(['a', 'b', 'c']), 1)") + " as shl",
      KqlCompat.rewrite("array_iff(dynamic([true, false]), dynamic([1, 2]), dynamic([9, 8]))") + " as ai",
      KqlCompat.rewrite("round(jaccard_index(dynamic([1, 2]), dynamic([2, 3])), 6)") + " as j",
      KqlCompat.rewrite("array_slice(dynamic([1, 2, 3, 4]), 0, 2)") + " as sl").head
    assert(r.getSeq[Int](0) == Seq(2, 3, 4, 1))     // rotate by 5 ≡ by 1 (pmod)
    assert(r.getSeq[Int](1) == Seq(4, 1, 2, 3))
    assert(r.getSeq[String](2) == Seq("b", "c", null)) // null pad keeps type
    assert(r.getSeq[Int](3) == Seq(1, 8))
    assert(r.getDouble(4) == 0.333333)
    assert(r.getSeq[Int](5) == Seq(1, 2, 3))        // 0-based inclusive bounds
  }

  test("url/version/regex scalar tail: parse_url, parse_version, trims, quoting") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("parse_url('https://user@example.com:8080/a/b?x=1&y=2#frag')") + " as u",
      KqlCompat.rewrite("parse_version('10.2.0.1') > parse_version('2.9.9.9')") + " as vc",
      KqlCompat.rewrite("parse_version('1.2') == parse_version('1.2.0.0')") + " as ve",
      KqlCompat.rewrite("translate('abc', 'xyz', 'aabbcc')") + " as tr",
      KqlCompat.rewrite("trim_start('[0-9]+', '123abc456')") + " as ts",
      KqlCompat.rewrite("trim_end('[0-9]+', '123abc456')") + " as te",
      KqlCompat.rewrite("isascii('plain')") + " as aa",
      KqlCompat.rewrite("isascii('café')") + " as ab",
      KqlCompat.rewrite("indexof_regex('hello world', 'o w')") + " as ir",
      KqlCompat.rewrite("indexof_regex('abc', 'z+')") + " as irn",
      KqlCompat.rewrite("regex_quote('a.b*c\\\\d')") + " as rq",
      KqlCompat.rewrite("url_encode('a b&c')") + " as enc",
      KqlCompat.rewrite("url_decode('a%20b%26c')") + " as dec").head
    val u = r.getStruct(0)
    assert(u.getAs[String]("Scheme") == "https")
    assert(u.getAs[String]("Host") == "example.com")
    assert(u.getAs[String]("Port") == "8080")
    assert(u.getAs[String]("Path") == "/a/b")
    assert(u.getAs[String]("Query") == "x=1&y=2")
    assert(u.getAs[String]("Fragment") == "frag")
    assert(r.getBoolean(1) && r.getBoolean(2))
    assert(r.getString(3) == "xxyyzz")
    assert(r.getString(4) == "abc456")
    assert(r.getString(5) == "123abc")
    assert(r.getBoolean(6) && !r.getBoolean(7))
    assert(r.getLong(8) == 4L && r.getLong(9) == -1L)
    assert(r.getString(10) == "a\\.b\\*c\\\\d")
    assert(r.getString(11) == "a+b%26c")
    assert(r.getString(12) == "a b&c")
  }

  test("bitwise scalars and array_shift_right") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("binary_and(12, 10)") + " as a",
      KqlCompat.rewrite("binary_or(12, 10)") + " as o",
      KqlCompat.rewrite("binary_xor(12, 10)") + " as x",
      KqlCompat.rewrite("binary_not(0)") + " as n",
      KqlCompat.rewrite("binary_shift_left(1, 10)") + " as sl",
      KqlCompat.rewrite("binary_shift_right(1024, 3)") + " as sr",
      KqlCompat.rewrite("bitset_count_ones(255)") + " as bc",
      KqlCompat.rewrite("array_shift_right(dynamic([1, 2, 3, 4]), 1, 0)") + " as ar").head
    assert(r.getInt(0) == 8 && r.getInt(1) == 14 && r.getInt(2) == 6)
    assert(r.getInt(3) == -1)
    assert(r.getLong(4) == 1024L && r.getLong(5) == 128L && r.getLong(6) == 8L)
    assert(r.getSeq[Int](7) == Seq(0, 1, 2, 3))
  }

  test("totimespan parses [d.]hh:mm:ss and nulls out malformed input") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("datetime(2024-01-01) + totimespan('1.02:30:00')") + " as a",
      KqlCompat.rewrite("datetime(2024-01-01) + totimespan('02:30:00')") + " as b",
      KqlCompat.rewrite("totimespan('nonsense')") + " as c",
      KqlCompat.rewrite("substring('abcdef', 0, 2)") + " as s0",
      KqlCompat.rewrite("max_of(1, 9, 4)") + " as mx").head
    assert(r.getTimestamp(0).toString.startsWith("2024-01-02 02:30"))
    assert(r.getTimestamp(1).toString.startsWith("2024-01-01 02:30"))
    assert(r.isNullAt(2))
    assert(r.getString(3) == "ab")
    assert(r.getInt(4) == 9)
  }

  test("startofweek is Sunday-based") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("format_datetime(startofweek(datetime(2024-03-15)), 'yyyy-MM-dd')") + " as w",
      KqlCompat.rewrite("format_datetime(startofweek(datetime(2024-03-10)), 'yyyy-MM-dd')") + " as w2").head
    assert(r.getString(0) == "2024-03-10") // Friday → preceding Sunday
    assert(r.getString(1) == "2024-03-10") // Sunday → itself
  }

  test("typed aliases evaluate with KQL semantics") {
    val df = Seq(("Personal Cluster", 3L)).toDF("offering", "v")
    val r = df.select(
      KqlCompat.has($"offering", "personal").as("h"),
      KqlCompat.strcat($"offering", lit("!"), KqlCompat.tostring($"v")).as("s"),
      KqlCompat.iff($"v" > 2, lit(1), lit(0)).as("i")).head
    assert(r.getBoolean(0))
    assert(r.getString(1) == "Personal Cluster!3")
    assert(r.getInt(2) == 1)
  }

  test("bag algebra: earlier-wins merge, nested values survive, remove/has keys, null lanes") {
    val r = spark.range(1).selectExpr(
      """bag_merge('{"b":{"x":[1,2]},"a":1}', '{"a":9,"c":null}')""",
      """bag_remove_keys('{"a":1,"b":2,"c":3}', array('b', 'zz'))""",
      KqlCompat.rewrite("""bag_has_key('{"a":1}', 'a')"""),
      """bag_merge('not json', '{}')""").head
    assert(r.getString(0) == """{"a":1,"b":{"x":[1,2]},"c":null}""")
    assert(r.getString(1) == """{"a":1,"c":3}""")
    assert(r.getBoolean(2))
    assert(r.isNullAt(3))
  }

  test("compression codecs round-trip unicode and long input; garbage nulls out") {
    val r = spark.range(1).selectExpr(
      "zlib_decompress_from_base64_string(zlib_compress_to_base64_string('héllo wörld ünïcode'))",
      "length(gzip_decompress_from_base64_string(gzip_compress_to_base64_string(repeat('graft', 10000))))",
      "zlib_decompress_from_base64_string('!!notbase64!!')").head
    assert(r.getString(0) == "héllo wörld ünïcode")
    assert(r.getInt(1) == 50000)
    assert(r.isNullAt(2))
  }

  test("format_bytes edge tiers; format_timespan wraps hours without a day field") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("format_bytes(0)"),
      KqlCompat.rewrite("format_bytes(1125899906842624)"),
      KqlCompat.rewrite("format_bytes(1536, 1)"),
      KqlCompat.rewrite("format_timespan(totimespan('25:00:00'), 'hh:mm:ss')"),
      KqlCompat.rewrite("format_timespan(totimespan('2.00:00:01'), 'd.hh:mm:ss')")).head
    assert(r.getString(0) == "0 Bytes")
    assert(r.getString(1) == "1 PB")
    assert(r.getString(2) == "1.5 KB")
    assert(r.getString(3) == "01:00:00")
    assert(r.getString(4) == "2.00:00:01")
  }

  test("geohash rejects bad accuracy/coords/alphabet; welch_test null lanes") {
    val r = spark.range(1).selectExpr(
      "geo_point_to_geohash(0.0, 0.0, 13)",
      "geo_point_to_geohash(0.0, 91.0)",
      "geo_geohash_to_central_point('ez!42')",
      "welch_test(1.0, 1.0, 1, 2.0, 1.0, 30)",
      "welch_test(1.0, -1.0, 10, 2.0, 1.0, 30)").head
    (0 to 4).foreach(i => assert(r.isNullAt(i), s"col $i"))
  }

  test("parse_xml: nesting, and DOCTYPE is rejected (XXE hardening)") {
    val r = spark.range(1).selectExpr(
      "parse_xml('<a><b><c>1</c></b></a>')",
      "parse_xml('<!DOCTYPE foo [<!ENTITY x SYSTEM \"file:///etc/passwd\">]><a>&x;</a>')").head
    assert(r.getString(0) == """{"a":{"b":{"c":"1"}}}""")
    assert(r.isNullAt(1))
  }

  test("has_ipv4 family: delimiters, octet validity, prefix and list forms") {
    def b(kql: String): Boolean =
      spark.range(1).selectExpr(KqlCompat.rewrite(kql)).head.getBoolean(0)
    assert(b("has_ipv4('a 1.2.3.4 b')"))
    assert(!b("has_ipv4('a 999.2.3.4 b')"))       // octet out of range
    assert(!b("has_ipv4('a1.2.3.4 b')"))          // not delimited on the left
    assert(!b("has_ipv4('1.2.3.4.5')"))           // five parts, never delimited
    assert(b("has_ipv4('bad 300.1.1.1 ok 8.8.8.8')")) // later candidate wins
    assert(b("has_ipv4_prefix('x 118.56.2.9 y', '118.56.')"))
    assert(!b("has_ipv4_prefix('x 118.56.2.9 y', '119.')"))
    assert(b("has_any_ipv4('x 10.0.0.1 y', '8.8.8.8', '10.0.0.1')"))
    assert(!b("has_any_ipv4('x 10.0.0.1 y', '8.8.8.8')"))
  }

  test("has_any_ipv4_prefix: bare identifier = dynamic array COLUMN (r13 advice)") {
    import spark.implicits._
    val df = Seq(
      ("src 192.168.1.5 dst", Seq("10.", "192.168.")),
      ("src 172.16.0.9 dst", Seq("10.", "192.168."))).toDF("t", "prefixes")
    val got = df.selectExpr(KqlCompat.rewrite("has_any_ipv4_prefix(t, prefixes)"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false))
    // the other single-arg shapes hold: literal = ONE scalar prefix,
    // call-expression = ONE scalar prefix, pack_array(col) = explicit array
    val one = df.selectExpr(
      KqlCompat.rewrite("has_any_ipv4_prefix(t, '192.168.')"),
      KqlCompat.rewrite("has_any_ipv4_prefix(t, strcat('192.', '168.'))"),
      KqlCompat.rewrite("has_any_ipv4_prefix(t, pack_array(t))")) // scalar col via pack_array
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    assert(one == Seq((true, true, false), (false, false, false)))
  }

  test("datetime_diff counts period boundaries, Sunday-based for weeks") {
    val r = spark.range(1).selectExpr(
      // one minute apart across midnight: a DAY boundary was crossed
      KqlCompat.rewrite(
        "datetime_diff('day', datetime(2026-08-17 00:01:00), datetime(2026-08-16 23:59:00))") + " as d",
      // Saturday → Sunday crosses the ADX week boundary (weeks start Sunday);
      // Monday-based truncation would answer 0 here
      KqlCompat.rewrite(
        "datetime_diff('week', datetime(2026-08-16 01:00:00), datetime(2026-08-15 23:00:00))") + " as w",
      // and within one Sunday-based week: 0 (Spark's Monday week has a
      // boundary between Sunday and Monday that ADX does not)
      KqlCompat.rewrite(
        "datetime_diff('week', datetime(2026-08-17 01:00:00), datetime(2026-08-16 23:00:00))") + " as w0",
      KqlCompat.rewrite(
        "datetime_diff('month', datetime(2026-03-01 00:00:01), datetime(2026-02-28 23:59:59))") + " as m",
      // nanosecond: Spark's timestampdiff has no NANOSECOND unit — emitted
      // as microseconds × 1000 (µs storage ⇒ every instant is ns-aligned)
      KqlCompat.rewrite(
        "datetime_diff('nanosecond', datetime(2026-08-16 00:00:01), datetime(2026-08-16 00:00:00))") + " as ns").head
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 0L)
    assert(r.getLong(3) == 1L)
    assert(r.getLong(4) == 1000000000L)
  }

  test("2-arg trim strips both ends; Spark's 1-arg trim passes through") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("trim('[-+]+', '--hi++')"),
      KqlCompat.rewrite("trim('  pad  ')")).head
    assert(r.getString(0) == "hi")
    assert(r.getString(1) == "pad")
  }

  test("nested dynamic literals and geodesic point-in-polygon") {
    // unit square (0,0)-(1,1): centre in, outside point out, and the
    // ray-casting parity survives a concave ring (tiny rings: gnomonic
    // projection ≈ planar, so the classic fixtures hold unchanged)
    def b(kql: String): Boolean =
      spark.range(1).selectExpr(KqlCompat.rewrite(kql)).head.getBoolean(0)
    val sq = "dynamic([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])"
    assert(b(s"geo_point_in_polygon(0.5, 0.5, $sq)"))
    assert(!b(s"geo_point_in_polygon(1.5, 0.5, $sq)"))
    assert(!b(s"geo_point_in_polygon(-0.5, 0.5, $sq)"))
    // concave "C": the notch (2, 1) is outside, the arm (0.5, 0.5) inside
    val c = "dynamic([[0.0, 0.0], [3.0, 0.0], [3.0, 0.4], [1.0, 0.4], " +
      "[1.0, 1.6], [3.0, 1.6], [3.0, 2.0], [0.0, 2.0]])"
    assert(!b(s"geo_point_in_polygon(2.0, 1.0, $c)"))
    assert(b(s"geo_point_in_polygon(0.5, 0.5, $c)"))
    // GEODESIC edges, not planar: the 45°N edge between lon ±30° bulges
    // to ~49.1°N at lon 0 (great-circle vertex: tan φ = tan 45° / cos 30°).
    // (0, 47) sits UNDER the bulge — planar ray casting would call it
    // inside the [45,60] "rectangle"; geodesically it is OUTSIDE.
    val rect = "dynamic([[-30.0, 45.0], [30.0, 45.0], [30.0, 60.0], [-30.0, 60.0]])"
    assert(!b(s"geo_point_in_polygon(0.0, 47.0, $rect)"))
    assert(b(s"geo_point_in_polygon(0.0, 50.0, $rect)"))   // above the bulge
    assert(b(s"geo_point_in_polygon(0.0, 62.0, $rect)"))   // top edge bulges to ~63.4°N
    assert(!b(s"geo_point_in_polygon(0.0, 64.0, $rect)"))
    assert(!b(s"geo_point_in_polygon(40.0, 50.0, $rect)")) // east of the ring
    // nested dynamic parses to array(array(...)): size probes
    val n = spark.range(1)
      .selectExpr(KqlCompat.rewrite("array_length(dynamic([[1, 2], [3, 4], [5, 6]]))"))
      .head.getInt(0)
    assert(n == 3)
  }

  test("bag_zip drops extra values, null-pads extra keys (ADX contract)") {
    val r = spark.range(1).selectExpr(
      // values longer than keys: extras DROPPED, never a null map key
      KqlCompat.rewrite("bag_zip(dynamic(['a', 'b']), dynamic([1, 2, 3]))") + " as more_vals",
      // keys longer than values: extras pair with null
      KqlCompat.rewrite("bag_zip(dynamic(['a', 'b', 'c']), dynamic([1]))") + " as more_keys").head
    assert(r.getString(0) == """{"a":1,"b":2}""")
    assert(r.getString(1) == """{"a":1,"b":null,"c":null}""")
  }

  test("dynamic([..]) bracket rewrite is double-quote aware") {
    // a double-quoted element containing brackets must pass through verbatim
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("""array_length(dynamic(["a[b", "c]d"]))""") + " as n",
      KqlCompat.rewrite("""dynamic(["x[1]"])[0]""") + " as s").head
    assert(r.getInt(0) == 2)
    assert(r.getString(1) == "x[1]")
  }

  test("dynamic_to_json quotes a non-JSON string with a valid JSON prefix") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("dynamic_to_json('123abc')") + " as trail",
      KqlCompat.rewrite("dynamic_to_json('123')") + " as num").head
    assert(r.getString(0) == "\"123abc\"") // string VALUE, not the '123' prefix token
    assert(r.getString(1) == "123")
  }

  test("parse_urlquery: decoded parameter bag in ADX shape") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("parse_urlquery('https://e.com/p?x=1&y=a%20b')") + " as q",
      KqlCompat.rewrite("parse_urlquery('https://e.com/p?x=1&x=2')") + " as dup",
      KqlCompat.rewrite("parse_urlquery('https://e.com/p')") + " as empty").head
    assert(r.getString(0) == """{"Query Parameters":{"x":"1","y":"a b"}}""")
    assert(r.getString(1) == """{"Query Parameters":{"x":"1"}}""") // earlier wins
    assert(r.getString(2) == """{"Query Parameters":{}}""")
  }

  test("geo_line_length and geo_polygon_area: geodesic closed forms") {
    val r = spark.range(1).selectExpr(
      // two 1-degree equator segments: 2 * R * pi/180
      KqlCompat.rewrite(
        "round(geo_line_length(dynamic([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])))") + " as len",
      // octant (0,0)-(90,0)-(0,90): exactly 1/8 of the sphere = pi/2 * R^2
      KqlCompat.rewrite(
        "abs(geo_polygon_area(dynamic([[0.0, 0.0], [90.0, 0.0], [0.0, 90.0]])) " +
          "/ (pi() / 2.0 * 6371008.8 * 6371008.8) - 1.0) < 1e-12") + " as oct_ok",
      // degenerate 2-vertex ring: area 0
      KqlCompat.rewrite(
        "geo_polygon_area(dynamic([[0.0, 0.0], [1.0, 1.0]])) == 0.0") + " as degen").head
    assert(r.getDouble(0) == math.round(2 * 6371008.8 * math.Pi / 180).toDouble)
    assert(r.getBoolean(1))
    assert(r.getBoolean(2))
  }

  test("format_ipv4_mask and parse_ipv6_mask: masked network text") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("format_ipv4_mask('192.165.12.17', 24)") + " as m24",
      KqlCompat.rewrite("format_ipv4_mask('192.165.12.17/20', 24)") + " as m20", // least wins
      KqlCompat.rewrite("format_ipv4_mask('1.2.3.4', 32)") + " as m32",
      KqlCompat.rewrite("format_ipv4_mask('not an ip', 24)") + " as bad",
      KqlCompat.rewrite("parse_ipv6_mask('2001:db8:abcd:12:ffff::1', 64)") + " as p64",
      KqlCompat.rewrite("parse_ipv6_mask('192.168.1.5', 128)") + " as p128",
      KqlCompat.rewrite("parse_ipv6_mask('nope', 64)") + " as pbad").head
    assert(r.getString(0) == "192.165.12.0/24")
    assert(r.getString(1) == "192.165.0.0/20")
    assert(r.getString(2) == "1.2.3.4/32")
    assert(r.isNullAt(3))
    assert(r.getString(4) == "2001:0db8:abcd:0012:0000:0000:0000:0000")
    assert(r.getString(5) == "0000:0000:0000:0000:0000:ffff:c0a8:0105")
    assert(r.isNullAt(6))
  }

  test("quarter boundaries: startofquarter truncates, endofquarter is last us") {
    val r = spark.range(1).selectExpr(
      KqlCompat.rewrite("tostring(startofquarter(datetime(2024-05-15)))"),
      KqlCompat.rewrite("tostring(endofquarter(datetime(2024-11-02)))")).head
    assert(r.getString(0) == "2024-04-01 00:00:00")
    assert(r.getString(1) == "2024-12-31 23:59:59.999999")
  }
}
