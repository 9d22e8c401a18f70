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

  test("line covering: buffered covering contains every point within radius") {
    import graft.functions.expressions.S2Cell
    val lngs = Array(-60.0, -45.0, -30.0, -15.0)
    val lats = Array(10.0, 25.0, 20.0, 35.0)
    val rM   = 500000.0
    val cover = S2Cell.coverLine(lngs, lats, 5, rM).get.toSet
    assert(cover.nonEmpty && cover.size <= 4096)
    // random points near the route: every point within rM of ANY vertex
    // (a subset of within-rM-of-the-line) must land in a covered cell
    val rnd = new scala.util.Random(19)
    var tested = 0
    (1 to 4000).foreach { _ =>
      val k   = rnd.nextInt(4)
      val dLa = (rnd.nextDouble() * 2 - 1) * 4.0
      val dLo = (rnd.nextDouble() * 2 - 1) * 4.0
      val (lo, la) = (lngs(k) + dLo, lats(k) + dLa)
      val dM = { // haversine to the vertex
        val h = math.sin(math.toRadians(la - lats(k)) / 2)
        val g = math.sin(math.toRadians(lo - lngs(k)) / 2)
        2 * 6371008.8 * math.asin(math.sqrt(h * h +
          math.cos(math.toRadians(la)) * math.cos(math.toRadians(lats(k))) * g * g))
      }
      if (dM <= rM) {
        tested += 1
        assert(cover.contains(S2Cell.cellId(lo, la, 5)), s"($lo,$la) dist $dM")
      }
    }
    assert(tested > 500, s"probe count $tested")
    // unbuffered covering is a subset of the buffered one
    assert(S2Cell.coverLine(lngs, lats, 5, 0.0).get.toSet.subsetOf(cover))
    assert(S2Cell.coverLine(Array(1.0), Array(1.0), 5, 0.0).isEmpty, "degenerate")
    assert(S2Cell.coverLine(lngs, lats, 31, 0.0).isEmpty, "bad level")
  }

  test("densify: spacing bound holds, endpoints exact, point count matches arithmetic") {
    import graft.functions.expressions.GeoDensify
    val pts = GeoDensify.densify(
      Array(0.0, 10.0, 10.0), Array(0.0, 0.0, 10.0), 100000.0, close = false).get
    // every consecutive gap ≤ tolerance (haversine)
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val h = math.sin(math.toRadians(b._2 - a._2) / 2)
      val g = math.sin(math.toRadians(b._1 - a._1) / 2)
      2 * 6371008.8 * math.asin(math.sqrt(h * h +
        math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) * g * g))
    }
    pts.sliding(2).foreach { w =>
      assert(hav(w(0), w(1)) <= 100000.0 + 1e-6, s"${w(0)} -> ${w(1)}")
    }
    assert(pts.head === ((0.0, 0.0)) && pts.last === ((10.0, 10.0)))
    // closed ring: first == last, same spacing bound
    val ring = GeoDensify.densify(
      Array(0.0, 5.0, 5.0, 0.0), Array(0.0, 0.0, 5.0, 5.0), 200000.0, close = true).get
    assert(ring.head === ring.last)
    ring.sliding(2).foreach { w => assert(hav(w(0), w(1)) <= 200000.0 + 1e-6) }
    assert(GeoDensify.densify(Array(0.0, 1.0), Array(0.0, 1.0), 0.0, close = false).isEmpty)
    assert(GeoDensify.densify(Array(0.0, 1.0), Array(0.0, 1.0), 1000.0, close = true).isEmpty)
  }

  test("simplify: every dropped point is within tolerance of the kept chain") {
    import graft.functions.expressions.GeoSimplify
    val rnd = new scala.util.Random(23)
    (1 to 20).foreach { _ =>
      val n = rnd.nextInt(30) + 5
      var lng = rnd.nextDouble() * 100 - 50
      var lat = rnd.nextDouble() * 80 - 40
      val lngs = Array.fill(n) { lng += rnd.nextDouble() * 2; lng }
      val lats = Array.fill(n) { lat += rnd.nextDouble() * 2 - 1; lat }
      val tol = 20000.0 + rnd.nextDouble() * 200000
      val kept = GeoSimplify.simplify(lngs, lats, tol, close = false).get
      assert(kept.head === ((lngs(0), lats(0))) && kept.last === ((lngs(n - 1), lats(n - 1))))
      // D-P invariant: every original point within tol of the simplified chain
      val keptLngs = kept.map(_._1); val keptLats = kept.map(_._2)
      (0 until n).foreach { i =>
        val d = minDistToChain(lngs(i), lats(i), keptLngs, keptLats)
        assert(d <= tol + 1e-6, s"point $i dist $d tol $tol")
      }
    }
  }

  private def minDistToChain(plng: Double, plat: Double,
      lngs: Array[(Double)], lats: Array[Double]): Double = {
    def xyz(lo: Double, la: Double) = {
      val rl = math.toRadians(lo); val rt = math.toRadians(la)
      Array(math.cos(rt) * math.cos(rl), math.cos(rt) * math.sin(rl), math.sin(rt))
    }
    val p = xyz(plng, plat)
    (1 until lngs.length).map { i =>
      val a = xyz(lngs(i - 1), lats(i - 1)); val b = xyz(lngs(i), lats(i))
      val nx = a(1)*b(2)-a(2)*b(1); val ny = a(2)*b(0)-a(0)*b(2); val nz = a(0)*b(1)-a(1)*b(0)
      val nn = nx*nx + ny*ny + nz*nz
      def chord(q: Array[Double]) = {
        val dx = p(0)-q(0); val dy = p(1)-q(1); val dz = p(2)-q(2)
        2 * math.asin(math.min(1.0, math.sqrt(dx*dx + dy*dy + dz*dz) / 2))
      }
      val ends = math.min(chord(a), chord(b))
      if (nn == 0) ends
      else {
        val c1 = Array(ny*a(2)-nz*a(1), nz*a(0)-nx*a(2), nx*a(1)-ny*a(0))
        val c2 = Array(b(1)*nz-b(2)*ny, b(2)*nx-b(0)*nz, b(0)*ny-b(1)*nx)
        val within = c1(0)*p(0)+c1(1)*p(1)+c1(2)*p(2) >= 0 &&
          c2(0)*p(0)+c2(1)*p(1)+c2(2)*p(2) >= 0
        if (within) math.asin(math.min(1.0, math.abs(p(0)*nx+p(1)*ny+p(2)*nz) / math.sqrt(nn)))
        else ends
      }
    }.min * 6371008.8
  }

  test("point buffer: vertices on the exact radius at every tolerance") {
    val rows = spark.sql(
      """SELECT geo_point_buffer(10.0, 55.0, 250000.0, 500.0) AS b,
        |geo_point_buffer(-170.0, -30.0, 50000.0) AS wrap""".stripMargin).head()
    Seq(rows.getString(0), rows.getString(1)).zip(Seq((10.0, 55.0, 250000.0), (-170.0, -30.0, 50000.0))).foreach {
      case (js, (clng, clat, r)) =>
        val ring = js.split("\\[\\[\\[")(1).split("\\]\\]\\]")(0)
          .split("\\],\\[").map(_.split(",").map(_.toDouble))
        assert(ring.length >= 9)
        ring.foreach { v =>
          val h = math.sin(math.toRadians(v(1) - clat) / 2)
          val g = math.sin(math.toRadians(v(0) - clng) / 2)
          val d = 2 * 6371008.8 * math.asin(math.sqrt(h * h +
            math.cos(math.toRadians(clat)) * math.cos(math.toRadians(v(1))) * g * g))
          assert(math.abs(d - r) < 0.001, s"vertex ${v.toSeq} dist $d want $r")
          assert(v(0) >= -180 && v(0) <= 180, "antimeridian wrap")
        }
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
