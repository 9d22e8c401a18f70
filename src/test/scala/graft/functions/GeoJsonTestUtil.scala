package graft.functions.expressions

/** Shared GeoJSON test helpers for the geometry specs — one copy of the
  * ring parser and the area fold, so an emitter formatting change breaks
  * every consuming spec loudly instead of one copy silently parsing zero
  * rings.
  */
object GeoJsonTestUtil {

  /** ALL rings of a Polygon/MultiPolygon GeoJSON as [lng,lat] arrays —
    * interior rings included, in emission order (outer first, its CW
    * holes after it). */
  def rings(json: String): Seq[Array[(Double, Double)]] = {
    if (json.contains("GeometryCollection")) return Seq.empty
    val coords = json.split("\"coordinates\":")(1).dropRight(1)
    val ringRe = "\\[(\\[-?[0-9.Ee-]+,-?[0-9.Ee-]+\\],?)+\\]".r
    ringRe.findAllIn(coords).map { r =>
      r.drop(1).dropRight(1).split("\\],\\[").map { p =>
        val xy = p.replaceAll("[\\[\\]]", "").split(",")
        (xy(0).toDouble, xy(1).toDouble)
      }
    }.toSeq
  }

  /** Total spherical area (m²) of the GeoJSON: SIGNED sum over rings, so
    * CW interior rings (holes) subtract — identical to the old |area| sum
    * on hole-free output where every ring is CCW. */
  def areaOf(json: String): Double =
    rings(json).map { r =>
      val open = r.dropRight(1) // closed GeoJSON ring -> open
      GeoClip.signedAreaM2(open.map { case (lo, la) => GeoClip.xyz(lo, la) })
    }.sum

  /** A quad centered at (clng, clat) with half-extents ex/ey degrees. */
  def quad(clng: Double, clat: Double, ex: Double, ey: Double)
      : (Array[Double], Array[Double]) =
    (Array(clng - ex, clng + ex, clng + ex, clng - ex),
     Array(clat - ey, clat - ey, clat + ey, clat + ey))
}
