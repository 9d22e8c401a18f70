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
}
