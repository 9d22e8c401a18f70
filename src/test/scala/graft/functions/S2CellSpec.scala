package graft.functions

import graft.SparkSuite
import graft.functions.expressions.S2Cell

/** Unit contract for the S2 cell primitives (the SQL surface is gated by
  * q_kql_geo_s2 / q_kql_geo_s2join oracles; this spec pins the algorithm's
  * structural invariants directly, including the canonical-token vectors).
  */
class S2CellSpec extends SparkSuite {

  test("face centers encode to the six face-cell tokens") {
    // level-0 cell ids are (2·face+1) << 60 → tokens 1,3,5,7,9,b
    val faces = Seq((0.0, 0.0) -> "1", (90.0, 0.0) -> "3", (0.0, 90.0) -> "5",
      (180.0, 0.0) -> "7", (-90.0, 0.0) -> "9", (0.0, -90.0) -> "b")
    faces.foreach { case ((lng, lat), want) =>
      assert(S2Cell.token(S2Cell.cellId(lng, lat, 0)) === want, s"($lng,$lat)")
    }
  }

  test("canonical region tokens: Paris 47e4, SF Bay 8085809f, Tokyo face 3") {
    // well-known S2 token prefixes for these regions (public S2 demos)
    assert(S2Cell.token(S2Cell.cellId(2.3522, 48.8566, 5)) === "47e4")
    assert(S2Cell.token(S2Cell.cellId(-122.4194, 37.7749, 14)) === "8085809f")
    assert(S2Cell.token(S2Cell.cellId(139.6917, 35.6895, 11)) === "60188cc")
  }

  test("center∘encode is a fixpoint at every level; child center lands in parent") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val lng = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 179.8 - 89.9
      Seq(3, 11, 17, 30).foreach { lv =>
        val id = S2Cell.cellId(lng, lat, lv)
        val (clng, clat) = S2Cell.centralPoint(id)
        assert(S2Cell.cellId(clng, clat, lv) === id, s"roundtrip ($lng,$lat,$lv)")
        if (lv == 17)
          assert(S2Cell.cellId(clng, clat, 11) === S2Cell.cellId(lng, lat, 11),
            s"parent ($lng,$lat)")
      }
    }
  }

  test("neighbors: counts, symmetry, level preservation") {
    // face cells: 4 edge-adjacent faces (diagonals coincide — deduped)
    assert(S2Cell.neighbors(S2Cell.idFromToken("1")).map(S2Cell.token).sorted
      === Seq("3", "5", "9", "b"))
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val lng = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 170 - 85
      val id = S2Cell.cellId(lng, lat, 8)
      val ns = S2Cell.neighbors(id)
      assert(ns.size >= 7 && ns.size <= 8, s"($lng,$lat): ${ns.size}")
      assert(ns.distinct.size == ns.size)
      ns.foreach { n =>
        // same level, and adjacency is symmetric (covers the cross-face wrap)
        assert(java.lang.Long.numberOfTrailingZeros(n) ===
          java.lang.Long.numberOfTrailingZeros(id))
        assert(S2Cell.neighbors(n).contains(id), s"asymmetric at ($lng,$lat)")
      }
    }
  }

  test("token round-trips through idFromToken; malformed tokens rejected") {
    val id = S2Cell.cellId(12.34, 56.78, 13)
    assert(S2Cell.idFromToken(S2Cell.token(id)) === id)
    // face-5 ids have the sign bit set — must still round-trip
    val neg = S2Cell.cellId(0.0, -90.0, 8)
    assert(neg < 0 && S2Cell.idFromToken(S2Cell.token(neg)) === neg)
    Seq("", "zzz", "X", "0", "12345678901234567", "2000000000000000" /* odd tz */)
      .foreach(t => assert(S2Cell.idFromToken(t) === 0L, t))
  }

  test("polygon covering is a conservative superset: sampled inner points' cells are covered") {
    val polys = Seq(
      (Array(-3.0, 4.0, 3.5, -2.5), Array(-2.0, -2.5, 3.0, 3.5), 6),
      (Array(-15.0, 15.0, 12.0, -12.0), Array(-10.0, -12.0, 14.0, 16.0), 5),
      (Array(105.0, 135.0, 132.0, 108.0), Array(15.0, 12.0, 38.0, 40.0), 5),
      (Array(-125.0, -95.0, -98.0, -122.0), Array(32.0, 30.0, 55.0, 57.0), 5))
    val rnd = new scala.util.Random(11)
    polys.foreach { case (lngs, lats, lv) =>
      val cov = S2Cell.cover(lngs, lats, lv)
      assert(cov.isDefined && cov.get.nonEmpty)
      info(s"cover size at level $lv: ${cov.get.size}")
      val toks = cov.get.map(S2Cell.token).toSet
      assert(toks.size === cov.get.size) // distinct, and sorted-determinism
      assert(cov.get === cov.get.sorted)
      // vertices and 300 random convex combinations of vertices (all inside
      // the sampled vertex box, hence inside the covering contract's domain)
      val pts = lngs.zip(lats).toSeq ++ (1 to 300).map { _ =>
        val w  = Array.fill(lngs.length)(rnd.nextDouble())
        val ws = w.sum
        (lngs.zip(w).map(p => p._1 * p._2).sum / ws,
         lats.zip(w).map(p => p._1 * p._2).sum / ws)
      }
      pts.foreach { case (lo, la) =>
        assert(toks.contains(S2Cell.token(S2Cell.cellId(lo, la, lv))),
          s"point ($lo,$la) cell missing at level $lv")
      }
    }
  }

  test("polygon covering rejects degenerate / oversized / out-of-range input") {
    assert(S2Cell.cover(Array(0.0, 1.0), Array(0.0, 1.0), 6).isEmpty)
    assert(S2Cell.cover(Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0), 31).isEmpty)
    assert(S2Cell.cover(Array(-170.0, 170.0, 0.0), Array(0.0, 0.0, 10.0), 5).isEmpty,
      "antimeridian-spanning vertex box")
    assert(S2Cell.cover(Array(-40.0, 40.0, 0.0), Array(40.0, 40.0, 89.8), 5).isEmpty,
      "pole-touching padded box")
    // 30°-wide polygon at level 12 → far past the 4096-cell cap
    assert(S2Cell.cover(Array(-15.0, 15.0, 12.0, -12.0),
      Array(-10.0, -12.0, 14.0, 16.0), 12).isEmpty)
  }

  test("cell polygon: face-0 corners are the exact cube corners, ring closed") {
    val gj = S2Cell.cellPolygon(S2Cell.idFromToken("1"))
    assert(gj.startsWith("""{"type":"Polygon","coordinates":[[["""))
    // corner (s,t)=(0,0) → xyz (1,-1,-1) → lng atan2(-1,1) = -45°,
    // lat atan2(-1,√2) ≈ -35.26438968°
    assert(gj.contains("[-45.0,-35.264389682754654]"))
    val ring = gj.split("\\[\\[\\[")(1).split("\\]\\]\\]")(0).split("\\],\\[")
    assert(ring.length === 5 && ring.head === ring.last)
  }
}
