package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.Row

/** Unit contract for the round-10 batch-5 geo/byte surface: geohash cell
  * polygons, MSVCRT command-line parsing, base64 byte arrays, and the
  * great-circle intersection / centroid expansions (their SQL pins live in
  * q_kql_geo_shapes / q_kql_geo_intersects / q_kql_cmdline_bytes).
  */
class GeoShapesSpec extends SparkSuite {

  private def one(sql: String): Row = spark.sql(s"SELECT $sql").head()

  test("geohash polygon: center is the rect midpoint, ring closed, malformed null") {
    val r = one(
      """get_json_object(geo_geohash_to_polygon('u4pruyd'), '$.coordinates[0]') AS ring,
        |geo_geohash_to_central_point('u4pruyd') AS cp,
        |geo_geohash_to_polygon('bad!') AS bad""".stripMargin)
    assert(r.isNullAt(2))
    val ring = r.getString(0)
    val pts = ring.stripPrefix("[").stripSuffix("]").split("\\],\\[")
      .map(_.replaceAll("[\\[\\]]", "").split(",").map(_.toDouble))
    assert(pts.length === 5)
    assert(pts.head.toSeq === pts.last.toSeq, "ring closed")
    val (w, s) = (pts(0)(0), pts(0)(1))
    val (e, n) = (pts(2)(0), pts(2)(1))
    val cp = r.getString(1)
    val cs = cp.split("\\[")(1).stripSuffix("]}").split(",").map(_.toDouble)
    assert(math.abs(cs(0) - (w + e) / 2) < 1e-12, "lng midpoint")
    assert(math.abs(cs(1) - (s + n) / 2) < 1e-12, "lat midpoint")
    assert(w < e && s < n)
  }

  test("parse_command_line: MSVCRT rule table") {
    // (input, expected tokens); backslash runs written natively in Scala
    val cases = Seq(
      ("""x.exe a "b c"  d""", Seq("x.exe", "a", "b c", "d")),
      ("""say \"lit\" now""", Seq("say", "\"lit\"", "now")),
      ("""a\\"b c" t""", Seq("a\\b c", "t")),             // 2 bs -> 1 bs + quote toggles
      ("""p \\\"q r""", Seq("p", "\\\"q", "r")),          // 3 bs -> 1 bs + literal quote
      ("""dir c:\tmp\sub""", Seq("dir", "c:\\tmp\\sub")), // lone backslashes literal
      ("""onlyone""", Seq("onlyone")),
      ("""tab	split""", Seq("tab", "split")),
      ("""q "unclosed span""", Seq("q", "unclosed span")))
    cases.foreach { case (in, want) =>
      val df = spark.range(1).selectExpr(
        s"parse_command_line('${in.replace("\\", "\\\\").replace("'", "''")}', 'windows') AS a")
      assert(df.head().getSeq[String](0) === want, s"input <$in>")
    }
    assert(one("parse_command_line('x', 'linux')").isNullAt(0))
    assert(one("parse_command_line('', 'windows')").isNullAt(0))
  }

  test("base64 byte arrays: random round-trip, range rejection") {
    val rnd = new scala.util.Random(11)
    (1 to 30).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(40) + 1)(rnd.nextInt(256))
      val lit = bytes.mkString("array(", "L,", "L)")
      val r = one(s"base64_encode_fromarray($lit) AS b64," +
        s"base64_decode_toarray(base64_encode_fromarray($lit)) AS rt")
      assert(r.getString(0) ===
        java.util.Base64.getEncoder.encodeToString(bytes.map(_.toByte)))
      assert(r.getSeq[Long](1) === bytes.map(_.toLong).toSeq)
    }
    assert(one("base64_encode_fromarray(array(-1L))").isNullAt(0))
    assert(one("base64_encode_fromarray(array(256L))").isNullAt(0))
    assert(one("base64_decode_toarray('@@@')").isNullAt(0))
  }

  test("intersects_2lines is symmetric across the validated case table") {
    val cases = Seq( // (ax,ay,bx,by, cx,cy,dx,dy, expected)
      (0.0, -5.0, 0.0, 5.0, -5.0, 0.0, 5.0, 0.0, true),
      (0.0, 0.0, 10.0, 0.0, 0.0, 1.0, 10.0, 1.0, false),
      (0.0, -5.0, 0.0, 5.0, 175.0, 0.0, -175.0, 0.0, false),
      (10.0, 60.0, 20.0, 60.0, 15.0, 55.0, 15.0, 65.0, true))
    cases.foreach { case (ax, ay, bx, by, cx, cy, dx, dy, want) =>
      def seg(p: (Double, Double, Double, Double)) =
        s"array(array(${p._1}D, ${p._2}D), array(${p._3}D, ${p._4}D))"
      val q = graft.functions.KqlCompat.rewrite(
        s"geo_intersects_2lines(${seg((ax, ay, bx, by))}, ${seg((cx, cy, dx, dy))}) AS f," +
          s"geo_intersects_2lines(${seg((cx, cy, dx, dy))}, ${seg((ax, ay, bx, by))}) AS r")
      val row = one(q)
      assert(row.getBoolean(0) === want, s"fwd ($ax,$ay)")
      assert(row.getBoolean(1) === want, s"rev ($ax,$ay)")
    }
  }

  test("polygon centroid of an equator-symmetric square is its center") {
    val q = graft.functions.KqlCompat.rewrite(
      "geo_polygon_centroid(array(array(9.0D, -1.0D), array(11.0D, -1.0D), " +
        "array(11.0D, 1.0D), array(9.0D, 1.0D))) AS c")
    val cs = one(q).getString(0).split("\\[")(1).stripSuffix("]}")
      .split(",").map(_.toDouble)
    assert(math.abs(cs(0) - 10.0) < 1e-9)
    assert(math.abs(cs(1)) < 1e-9)
  }
}
