package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{ArrayType, DataType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** S2 cell scalars — ADX `geo_point_to_s2cell(lng, lat [, level])` and
  * `geo_s2cell_to_central_point(token)` (GeoJSON Point bag, the geohash
  * twin's currency). The S2 cell id is ADX's standard SCALABLE geo-join
  * primitive: the token is a fixed-size prefix-coded Hilbert-curve address,
  * so "same cell at level L" is a plain equi-join key — geo joins bucket
  * instead of cross-joining (the ipv4_lookup shape on the sphere).
  *
  * Public S2 geometry algorithm (s2geometry.io): lat/lng → unit XYZ →
  * cube face + (u,v) → quadratic (s,t) → 30-bit (i,j) → Hilbert curve
  * position → 64-bit id `face(3) ‖ pos(2·level) ‖ 1 ‖ 0…`; token = hex
  * with trailing zeros stripped. Levels 0..30; default 11 (ADX default).
  * Null on out-of-range coordinates / level, or a malformed token — the
  * scalar-surface try-null convention.
  *
  * Reference behavior: mirror-lake-kusto exposes ADX's geo scalars to its
  * query layer; cell functions per ADX docs (level default 11). Verified
  * against structural vectors (face centers encode to tokens 1/3/5/7/9/b,
  * center∘encode is a fixpoint at every level, child-center lands in the
  * parent cell).
  */
object S2Cell {
  private val MaxLevel = 30
  // canonical S2 Hilbert lookup tables: swap=1, invert=2
  private val IJ2Pos = Array(Array(0, 1, 3, 2), Array(0, 3, 1, 2), Array(2, 3, 1, 0), Array(2, 1, 3, 0))
  private val Pos2IJ = Array(Array(0, 1, 3, 2), Array(0, 2, 3, 1), Array(3, 2, 0, 1), Array(3, 1, 0, 2))
  private val Pos2Or = Array(1, 0, 0, 3)

  private def stFromUv(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1 + 3 * u) else 1 - 0.5 * math.sqrt(1 - 3 * u)

  private def uvFromSt(s: Double): Double =
    if (s >= 0.5) (4 * s * s - 1) / 3 else (1 - 4 * (1 - s) * (1 - s)) / 3

  /** Leaf-level cell id truncated to `level`; requires valid inputs. */
  def cellId(lng: Double, lat: Double, level: Int): Long = {
    val laR = math.toRadians(lat); val loR = math.toRadians(lng)
    cellIdFromXyz(
      math.cos(laR) * math.cos(loR),
      math.cos(laR) * math.sin(loR),
      math.sin(laR), level)
  }

  /** Cell id of the (not necessarily unit) direction vector at `level`. */
  def cellIdFromXyz(x: Double, y: Double, z: Double, level: Int): Long = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    val face =
      if (ax >= ay && ax >= az) { if (x > 0) 0 else 3 }
      else if (ay >= ax && ay >= az) { if (y > 0) 1 else 4 }
      else { if (z > 0) 2 else 5 }
    val (u, v) = face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }
    def ij(c: Double): Long =
      math.min(math.max(math.floor(stFromUv(c) * (1L << MaxLevel)).toLong, 0L), (1L << MaxLevel) - 1)
    val i = ij(u); val j = ij(v)
    var bits = face & 1 // SWAP_MASK of the face cell
    var pos  = 0L
    var k    = MaxLevel - 1
    while (k >= 0) {
      val ijBits = ((((i >> k) & 1) << 1) | ((j >> k) & 1)).toInt
      val p = IJ2Pos(bits)(ijBits)
      pos = (pos << 2) | p
      bits ^= Pos2Or(p)
      k -= 1
    }
    val leaf = (face.toLong << 61) | (pos << 1) | 1L
    val lsb  = 1L << (2 * (MaxLevel - level))
    (leaf & -lsb) | lsb
  }

  /** Level encoded in the id (position of its lsb). Valid ids only. */
  def levelOf(id: Long): Int =
    MaxLevel - java.lang.Long.numberOfTrailingZeros(id) / 2

  /** Ancestor id at `level` (≤ the id's own level): position bits below
    * the target level cleared, target lsb set. */
  def parentId(id: Long, level: Int): Long = {
    val lsb = 1L << (2 * (MaxLevel - level))
    (id & -lsb) | lsb
  }

  /** The four child ids one level finer: ±lsb/4 and ±3·lsb/4 around the
    * parent center. Caller guarantees level < MaxLevel. */
  def childIds(id: Long): Array[Long] = {
    val clsb = (id & -id) >>> 2
    Array(id - 3 * clsb, id - clsb, id + clsb, id + 3 * clsb)
  }

  /** Hex token: 16 digits with trailing zeros stripped (S2 convention). */
  def token(id: Long): String = {
    val h = f"$id%016x"
    var end = h.length
    while (end > 1 && h.charAt(end - 1) == '0') end -= 1
    h.substring(0, end)
  }

  /** Token → id, or 0 if malformed (bad hex, bad length, invalid cell:
    * face > 5 or an odd trailing-zero count). 0 is never a valid id, and
    * face-4/5 ids have the sign bit set — the sentinel must not be
    * signed-negative.
    */
  def idFromToken(t: String): Long = {
    if (t.isEmpty || t.length > 16 || !t.forall(c => Character.digit(c, 16) >= 0)) return 0L
    val id = java.lang.Long.parseUnsignedLong((t + "0" * (16 - t.length)), 16)
    if (id == 0L) return 0L
    val face = (id >>> 61).toInt
    if (face > 5) return 0L
    val tz = java.lang.Long.numberOfTrailingZeros(id)
    if (tz % 2 != 0 || tz > 2 * MaxLevel) return 0L
    id
  }

  private def faceUvToXyz(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1.0, u, v)
      case 1 => (-u, 1.0, v)
      case 2 => (-u, -v, 1.0)
      case 3 => (-1.0, -v, -u)
      case 4 => (v, -1.0, -u)
      case _ => (v, u, -1.0)
    }

  /** Decode (face, level, leaf i, leaf j) from a valid id. */
  private def faceLevelIJ(id: Long): (Int, Int, Long, Long) = {
    val face  = (id >>> 61).toInt
    val level = MaxLevel - java.lang.Long.numberOfTrailingZeros(id) / 2
    val pos   = (id >>> 1) & ((1L << 60) - 1)
    var bits  = face & 1
    var i = 0L; var j = 0L
    var k = MaxLevel - 1
    while (k >= 0) {
      val p = ((pos >> (2 * k)) & 3).toInt
      val ijBits = Pos2IJ(bits)(p)
      i = (i << 1) | (ijBits >> 1)
      j = (j << 1) | (ijBits & 1)
      bits ^= Pos2Or(p)
      k -= 1
    }
    (face, level, i, j)
  }

  /** (lng, lat) of the cell center; requires a valid id. */
  def centralPoint(id: Long): (Double, Double) = {
    val (face, level, i, j) = faceLevelIJ(id)
    // any leaf extending the cell's Hilbert prefix lies inside the cell —
    // mask to the cell's corner, center is corner + half-size in si/ti
    val sz = 1L << (MaxLevel - level)
    val si = 2 * (i & -sz) + sz
    val ti = 2 * (j & -sz) + sz
    val u = uvFromSt(si.toDouble / (1L << 31))
    val v = uvFromSt(ti.toDouble / (1L << 31))
    val (x, y, z) = faceUvToXyz(face, u, v)
    (math.toDegrees(math.atan2(y, x)), math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))))
  }

  /** The (up to 8) edge- and vertex-adjacent cells at the same level —
    * distinct, self excluded. Cross-face neighbors resolve by extending
    * the quadratic ST transform beyond [0,1]: the overflowed (u,v) leaves
    * the face square, and the XYZ it maps to re-derives the adjacent
    * face's cell. At cube corners diagonal steps coincide with edge
    * neighbors (deduped) — corner cells have fewer than 8.
    */
  def neighbors(id: Long): Seq[Long] = {
    val (face, level, i, j) = faceLevelIJ(id)
    val sz   = 1L << (MaxLevel - level)
    val imin = i & -sz
    val jmin = j & -sz
    val out = for {
      di <- -1 to 1; dj <- -1 to 1; if di != 0 || dj != 0
    } yield {
      val si = 2 * (imin + di * sz) + sz // may overflow [0, 2^31) — wraps
      val ti = 2 * (jmin + dj * sz) + sz
      val u = uvFromSt(si.toDouble / (1L << 31))
      val v = uvFromSt(ti.toDouble / (1L << 31))
      val (x, y, z) = faceUvToXyz(face, u, v)
      cellIdFromXyz(x, y, z, level)
    }
    out.distinct.filterNot(_ == id)
  }

  private def xyzOf(lng: Double, lat: Double): (Double, Double, Double) = {
    val laR = math.toRadians(lat); val loR = math.toRadians(lng)
    (math.cos(laR) * math.cos(loR), math.cos(laR) * math.sin(loR), math.sin(laR))
  }

  private def lngLatOf(x: Double, y: Double, z: Double): (Double, Double) =
    (math.toDegrees(math.atan2(y, x)),
     math.toDegrees(math.atan2(z, math.sqrt(x * x + y * y))))

  /** Corner/edge-sampled lat-lng box of the cell: 4 corners plus 4 samples
    * along each boundary edge in (s,t) space. Returns (latMin, latMax,
    * lngMin, lngMax, wraps) where wraps = the raw lng span exceeds 180°
    * (the cell straddles the antimeridian, so the naive box is the
    * complement of the cell's true lng range).
    */
  private def cellBox(id: Long): (Double, Double, Double, Double, Boolean) = {
    val (face, level, i, j) = faceLevelIJ(id)
    val sz = 1L << (MaxLevel - level)
    val i0 = i & -sz; val j0 = j & -sz
    var laMin = 91.0; var laMax = -91.0; var loMin = 181.0; var loMax = -181.0
    val per = 4
    var e = 0
    while (e <= per) {
      val f = e.toDouble / per
      val pts = Array(
        (i0 + f * sz, j0.toDouble), (i0 + f * sz, (j0 + sz).toDouble),
        (i0.toDouble, j0 + f * sz), ((i0 + sz).toDouble, j0 + f * sz))
      pts.foreach { case (ii, jj) =>
        val u = uvFromSt(2.0 * ii / (1L << 31))
        val v = uvFromSt(2.0 * jj / (1L << 31))
        val (x, y, z) = faceUvToXyz(face, u, v)
        val (lo, la)  = lngLatOf(x, y, z)
        if (la < laMin) laMin = la; if (la > laMax) laMax = la
        if (lo < loMin) loMin = lo; if (lo > loMax) loMax = lo
      }
      e += 1
    }
    (laMin, laMax, loMin, loMax, loMax - loMin > 180.0)
  }

  /** Conservative S2 covering of a geodesic polygon: every cell at `level`
    * whose padded corner/edge-sampled lat-lng box intersects the polygon's
    * padded sampled box. CONSERVATIVE by construction — a point inside the
    * polygon always lands in a covered cell (the covering is a superset of
    * the true intersection set), so `explode(cover) ⋈ cell(point)` plus an
    * exact geo_point_in_polygon refine never drops a match; extra cells
    * only add refine work. Geodesic edge bulge is handled by sampling each
    * polygon edge on its great circle (65 points per edge) plus the
    * curvature pad. None on: fewer than 3 vertices, out-of-range inputs,
    * a vertex box spanning >180° lng (antimeridian crossing unsupported —
    * documented), a padded box touching a pole, or a covering larger than
    * 4096 cells (pick a coarser level; ADX likewise caps covering size).
    */
  def cover(lngs: Array[Double], lats: Array[Double], level: Int): Option[Seq[Long]] = {
    val n = lngs.length
    if (n < 3 || level < 0 || level > MaxLevel) return None
    if (lngs.exists(l => l < -180 || l > 180 || l.isNaN) ||
        lats.exists(l => l < -90 || l > 90 || l.isNaN)) return None
    if (lngs.max - lngs.min > 180.0) return None
    var laMin = 91.0; var laMax = -91.0; var loMin = 181.0; var loMax = -181.0
    var e = 0
    while (e < n) {
      val (x1, y1, z1) = xyzOf(lngs(e), lats(e))
      val (x2, y2, z2) = xyzOf(lngs((e + 1) % n), lats((e + 1) % n))
      var s = 0
      while (s <= 64) {
        val f = s / 64.0
        // chord point direction ≡ a great-circle point between the vertices
        val x = x1 + f * (x2 - x1); val y = y1 + f * (y2 - y1); val z = z1 + f * (z2 - z1)
        val (lo, la) = lngLatOf(x, y, z)
        if (la < laMin) laMin = la; if (la > laMax) laMax = la
        if (lo < loMin) loMin = lo; if (lo > loMax) loMax = lo
        s += 1
      }
      e += 1
    }
    // pad: edge-sample slack (0.5°) + cell-boundary curvature beyond the
    // sampled cell box, which halves per level from the ~10° face-cell case
    val pad = 0.5 + 27.0 / (1L << math.min(level, 20)).toDouble
    laMin -= pad; laMax += pad; loMin -= pad; loMax += pad
    if (laMax >= 90.0 || laMin <= -90.0) return None
    val seed = cellId(
      math.max(-180.0, math.min(180.0, (loMin + loMax) / 2)),
      (laMin + laMax) / 2, level)
    def hits(id: Long): Boolean = {
      val (cLaMin, cLaMax, cLoMin, cLoMax, wraps) = cellBox(id)
      val latOk = cLaMin - pad <= laMax && cLaMax + pad >= laMin
      if (!latOk) false
      else if (wraps) loMin <= cLoMin + pad || loMax >= cLoMax - pad
      else cLoMin - pad <= loMax && cLoMax + pad >= loMin
    }
    val seen     = scala.collection.mutable.HashSet[Long](seed)
    val included = scala.collection.mutable.ArrayBuffer[Long]()
    val queue    = scala.collection.mutable.Queue[Long](seed)
    while (queue.nonEmpty) {
      val c = queue.dequeue()
      if (hits(c)) {
        included += c
        if (included.size > 4096) return None
        neighbors(c).foreach(nb => if (seen.add(nb)) queue.enqueue(nb))
      }
    }
    Some(included.toSeq.sorted)
  }

  /** Conservative covering of a geodesic polyline, optionally buffered by
    * `radiusM` meters. Per segment, great-circle samples at ≤ half the
    * level's MINIMUM cell edge (S2 kMinEdge ≈ 0.943·2^-level rad) — so
    * consecutive samples land in the same or an adjacent cell — and every
    * sample contributes its cell plus all neighbors (covers any cell the
    * arc merely grazes between samples). The radius buffer is
    * ceil(r / minEdge) neighbor-BFS layers: each layer advances ≥ one
    * minimum cell edge in every direction, so the reach is ≥ r.
    * Superset-by-construction (the join contract — refine drops extras);
    * > 4096 cells or degenerate input → None.
    */
  def coverLine(lngs: Array[Double], lats: Array[Double], level: Int,
      radiusM: Double): Option[Seq[Long]] = {
    val n = lngs.length
    if (n < 2 || level < 0 || level > MaxLevel || radiusM < 0 || radiusM.isNaN)
      return None
    if (lngs.exists(l => l < -180 || l > 180 || l.isNaN) ||
        lats.exists(l => l < -90 || l > 90 || l.isNaN)) return None
    val minEdge = 0.943 / (1L << math.min(level, 30)).toDouble // radians
    val base    = scala.collection.mutable.LinkedHashSet[Long]()
    var e = 0
    while (e < n - 1) {
      val (x1, y1, z1) = xyzOf(lngs(e), lats(e))
      val (x2, y2, z2) = xyzOf(lngs(e + 1), lats(e + 1))
      val dotv  = math.max(-1.0, math.min(1.0, x1 * x2 + y1 * y2 + z1 * z2))
      val theta = math.acos(dotv)
      val steps = math.max(1L, math.ceil(theta / (minEdge / 2)).toLong)
      if (steps > (1L << 20)) return None // line too long for this level
      var s = 0L
      while (s <= steps) {
        val f = s.toDouble / steps
        val x = x1 + f * (x2 - x1); val y = y1 + f * (y2 - y1); val z = z1 + f * (z2 - z1)
        val (lo, la) = lngLatOf(x, y, z)
        val id = cellId(lo, la, level)
        if (base.add(id)) {
          if (base.size > 4096) return None
          neighbors(id).foreach { nb =>
            if (base.add(nb) && base.size > 4096) return None
          }
        }
        s += 1
      }
      e += 1
    }
    // buffer: k neighbor-BFS layers reach ≥ k · minEdge in every direction
    val layers = math.ceil(radiusM / (minEdge * 6371008.8)).toInt
    var frontier: Set[Long] = base.toSet
    var k = 0
    while (k < layers) {
      val next = scala.collection.mutable.HashSet[Long]()
      frontier.foreach { id =>
        neighbors(id).foreach { nb => if (base.add(nb)) next += nb }
      }
      if (base.size > 4096) return None
      frontier = next.toSet
      k += 1
    }
    Some(base.toSeq.sorted)
  }

  /** GeoJSON Polygon of the cell boundary: the 4 cube corners in CCW (s,t)
    * order, ring closed (geodesic edges between corners are implied — the
    * GeoJSON convention ADX uses for geo_s2cell_to_polygon).
    */
  def cellPolygon(id: Long): String = {
    val (face, level, i, j) = faceLevelIJ(id)
    val sz = 1L << (MaxLevel - level)
    val i0 = i & -sz; val j0 = j & -sz
    val corners = Array((i0, j0), (i0 + sz, j0), (i0 + sz, j0 + sz), (i0, j0 + sz))
    val ll = corners.map { case (ii, jj) =>
      val u = uvFromSt(2.0 * ii / (1L << 31))
      val v = uvFromSt(2.0 * jj / (1L << 31))
      val (x, y, z) = faceUvToXyz(face, u, v)
      lngLatOf(x, y, z)
    }
    val ring = (ll :+ ll.head).map { case (lo, la) => s"[$lo,$la]" }.mkString(",")
    s"""{"type":"Polygon","coordinates":[[$ring]]}"""
  }
}

case class GeoPointToS2Cell(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 3)
      TypeCheckResult.TypeCheckFailure("geo_point_to_s2cell takes (lng, lat [, level])")
    else if (!children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("geo_point_to_s2cell arguments must be numeric")
    else TypeCheckResult.TypeCheckSuccess

  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val lng = children(0).eval(input)
    val lat = children(1).eval(input)
    if (lng == null || lat == null) return null
    val level = if (children.size == 3) {
      val l = children(2).eval(input)
      if (l == null) return null
      val lv = num(l)
      if (lv.isNaN || lv.isInfinite) return null // NaN would truncate to 0
      lv.toInt
    } else 11 // ADX default
    val lngD = num(lng); val latD = num(lat)
    if (level < 0 || level > 30 ||
        lngD < -180 || lngD > 180 || latD < -90 || latD > 90 ||
        lngD.isNaN || latD.isNaN) null
    else UTF8String.fromString(S2Cell.token(S2Cell.cellId(lngD, latD, level)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoPointToS2Cell =
    copy(children = newChildren)

  override def prettyName: String = "geo_point_to_s2cell"
}

case class S2CellCentralPoint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("geo_s2cell_to_central_point argument must be a string")

  override protected def nullSafeEval(input: Any): Any = {
    val id = S2Cell.idFromToken(input.asInstanceOf[UTF8String].toString)
    if (id == 0L) null
    else {
      val (lng, lat) = S2Cell.centralPoint(id)
      UTF8String.fromString(s"""{"type":"Point","coordinates":[$lng,$lat]}""")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): S2CellCentralPoint =
    copy(child = newChild)

  override def prettyName: String = "geo_s2cell_to_central_point"
}

/** `geo_s2cell_neighbors(token)` — the up-to-8 same-level adjacent cell
  * tokens (lexicographically sorted for determinism; ADX leaves the order
  * unspecified), as an array usable directly in explode-based cover joins.
  * Null on a malformed token.
  */
case class GeoS2CellNeighbors(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("geo_s2cell_neighbors argument must be a string")

  override protected def nullSafeEval(input: Any): Any = {
    val id = S2Cell.idFromToken(input.asInstanceOf[UTF8String].toString)
    if (id == 0L) null
    else {
      val toks = S2Cell.neighbors(id).map(S2Cell.token).sorted
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(UTF8String.fromString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GeoS2CellNeighbors =
    copy(child = newChild)

  override def prettyName: String = "geo_s2cell_neighbors"
}

/** `geo_polygon_to_s2cells(polygon [, level])` — conservative S2 covering
  * of a geodesic polygon as an array of cell tokens (sorted; deterministic).
  * THE scalable polygon-join primitive: explode the covering into a
  * (poly, cell) dim, equi-join points on their own cell token, then refine
  * with the exact geo_point_in_polygon — candidate generation is a bucketed
  * hash join (broadcastable dim), never a points×polygons cross join.
  * Polygon = dynamic [[lng,lat], …] (open ring). Null on <3 vertices,
  * antimeridian-crossing or pole-touching boxes, bad level, or a covering
  * past 4096 cells (ADX likewise nulls oversized coverings — use a coarser
  * level). Covering membership is engine-specific; ours is a documented
  * conservative superset, which is exactly what join correctness needs
  * (the refine drops the extras).
  */
case class GeoPolygonToS2Cells(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def polyOk(t: DataType): Boolean = t match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(e, _), _) =>
        e.isInstanceOf[NumericType]
      case _ => false
    }
    if (children.size < 1 || children.size > 2)
      TypeCheckResult.TypeCheckFailure("geo_polygon_to_s2cells takes (polygon [, level])")
    else if (!polyOk(children.head.dataType))
      TypeCheckResult.TypeCheckFailure(
        "geo_polygon_to_s2cells polygon must be an array of [lng, lat] arrays")
    else if (children.size == 2 && !children(1).dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure("geo_polygon_to_s2cells level must be numeric")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val p = children.head.eval(input)
    if (p == null) return null
    val level = if (children.size == 2) {
      val l = children(1).eval(input)
      if (l == null) return null
      val lv = num(l)
      if (lv.isNaN || lv.isInfinite) return null // NaN would truncate to 0
      lv.toInt
    } else 11 // the ADX cell-level default
    val arr   = p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val inner = children.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
    val n    = arr.numElements()
    val lngs = new Array[Double](n)
    val lats = new Array[Double](n)
    var k = 0
    while (k < n) {
      val row = arr.get(k, inner)
      if (row == null) return null
      val pt = row.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (pt.numElements() < 2) return null
      lngs(k) = num(pt.get(0, inner.elementType))
      lats(k) = num(pt.get(1, inner.elementType))
      k += 1
    }
    S2Cell.cover(lngs, lats, level) match {
      case None => null
      case Some(ids) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ids.map(id => UTF8String.fromString(S2Cell.token(id))))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoPolygonToS2Cells =
    copy(children = newChildren)

  override def prettyName: String = "geo_polygon_to_s2cells"
}

/** `geo_s2cell_to_polygon(token)` — GeoJSON Polygon of the cell's 4 cube
  * corners (CCW, closed ring); null on a malformed token. The render/refine
  * twin of the covering.
  */
case class GeoS2CellToPolygon(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("geo_s2cell_to_polygon argument must be a string")

  override protected def nullSafeEval(input: Any): Any = {
    val id = S2Cell.idFromToken(input.asInstanceOf[UTF8String].toString)
    if (id == 0L) null
    else UTF8String.fromString(S2Cell.cellPolygon(id))
  }

  override protected def withNewChildInternal(newChild: Expression): GeoS2CellToPolygon =
    copy(child = newChild)

  override def prettyName: String = "geo_s2cell_to_polygon"
}

/** `geo_line_to_s2cells(line [, level [, radius_m]])` — conservative S2
  * covering of a geodesic polyline (see [[S2Cell.coverLine]]): the
  * bucketed-equi-join primitive for "points near a route" joins, with the
  * optional meter radius buffering the covering so a distance-`r` refine
  * loses no candidates. Null on degenerate input / out-of-range level /
  * coverings past the 4096-cell cap.
  */
case class GeoLineToS2Cells(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def lineOk(t: DataType): Boolean = t match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(e, _), _) =>
        e.isInstanceOf[NumericType]
      case _ => false
    }
    if (children.size < 1 || children.size > 3)
      TypeCheckResult.TypeCheckFailure("geo_line_to_s2cells takes (line [, level [, radius]])")
    else if (!lineOk(children.head.dataType))
      TypeCheckResult.TypeCheckFailure(
        "geo_line_to_s2cells line must be an array of [lng, lat] arrays")
    else if (!children.tail.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("geo_line_to_s2cells level/radius must be numeric")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val p = children.head.eval(input)
    if (p == null) return null
    val level = if (children.size >= 2) {
      val l = children(1).eval(input)
      if (l == null) return null
      val lv = num(l)
      if (lv.isNaN || lv.isInfinite) return null // NaN would truncate to 0
      lv.toInt
    } else 11
    val radius = if (children.size == 3) {
      val r = children(2).eval(input)
      if (r == null) return null
      num(r)
    } else 0.0
    val arr   = p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val inner = children.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
    val n    = arr.numElements()
    val lngs = new Array[Double](n)
    val lats = new Array[Double](n)
    var k = 0
    while (k < n) {
      val row = arr.get(k, inner)
      if (row == null) return null
      val pt = row.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (pt.numElements() < 2) return null
      lngs(k) = num(pt.get(0, inner.elementType))
      lats(k) = num(pt.get(1, inner.elementType))
      k += 1
    }
    S2Cell.coverLine(lngs, lats, level, radius) match {
      case None => null
      case Some(ids) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ids.map(id => UTF8String.fromString(S2Cell.token(id))))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoLineToS2Cells =
    copy(children = newChildren)

  override def prettyName: String = "geo_line_to_s2cells"
}

/** `geo_closest_point_on_line(lng, lat, line)` — GeoJSON Point of the
  * nearest point of the geodesic polyline: per segment the perpendicular
  * foot when it lands within the arc (the projection of p onto the edge
  * plane, normalized), else the nearer endpoint — the same unit-vector
  * closed form as the geo_distance_point_to_line expansion, so
  * geo_distance_2points(closest, p) == geo_distance_point_to_line(p, line)
  * to double precision (the in-plan gate q_kql_geo_closest asserts it).
  * Null on < 2 line points or out-of-range input.
  */
case class GeoClosestPointOnLine(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def lineOk(t: DataType): Boolean = t match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(e, _), _) =>
        e.isInstanceOf[NumericType]
      case _ => false
    }
    if (children.size != 3)
      TypeCheckResult.TypeCheckFailure("geo_closest_point_on_line takes (lng, lat, line)")
    else if (!children.take(2).forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckFailure("geo_closest_point_on_line lng/lat must be numeric")
    else if (!lineOk(children(2).dataType))
      TypeCheckResult.TypeCheckFailure(
        "geo_closest_point_on_line line must be an array of [lng, lat] arrays")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  override def eval(input: InternalRow): Any = {
    val lngV = children(0).eval(input)
    val latV = children(1).eval(input)
    val lineV = children(2).eval(input)
    if (lngV == null || latV == null || lineV == null) return null
    val plng = num(lngV); val plat = num(latV)
    if (plng < -180 || plng > 180 || plat < -90 || plat > 90 ||
        plng.isNaN || plat.isNaN) return null
    val arr   = lineV.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val inner = children(2).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
    val n = arr.numElements()
    if (n < 2) return null
    val vx = new Array[Double](n); val vy = new Array[Double](n); val vz = new Array[Double](n)
    var k = 0
    while (k < n) {
      val row = arr.get(k, inner)
      if (row == null) return null
      val pt = row.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (pt.numElements() < 2) return null
      val lo = num(pt.get(0, inner.elementType)); val la = num(pt.get(1, inner.elementType))
      if (lo < -180 || lo > 180 || la < -90 || la > 90 || lo.isNaN || la.isNaN) return null
      val rl = math.toRadians(lo); val rt = math.toRadians(la)
      vx(k) = math.cos(rt) * math.cos(rl); vy(k) = math.cos(rt) * math.sin(rl)
      vz(k) = math.sin(rt)
      k += 1
    }
    val prl = math.toRadians(plng); val prt = math.toRadians(plat)
    val px = math.cos(prt) * math.cos(prl); val py = math.cos(prt) * math.sin(prl)
    val pz = math.sin(prt)
    var bestD = Double.MaxValue
    var bx = 0.0; var by = 0.0; var bz = 1.0
    def chordDist(qx: Double, qy: Double, qz: Double): Double = {
      val dx = px - qx; val dy = py - qy; val dz = pz - qz
      2 * math.asin(math.min(1.0, math.sqrt(dx * dx + dy * dy + dz * dz) / 2))
    }
    var i = 1
    while (i < n) {
      val ax = vx(i - 1); val ay = vy(i - 1); val az = vz(i - 1)
      val cx2 = vx(i); val cy2 = vy(i); val cz2 = vz(i)
      val nx = ay * cz2 - az * cy2; val ny = az * cx2 - ax * cz2; val nz = ax * cy2 - ay * cx2
      val nn = nx * nx + ny * ny + nz * nz
      val pn = px * nx + py * ny + pz * nz
      // within-arc: p on the inner side of both great circles through the
      // endpoints perpendicular to the edge plane (same test as the SQL)
      val c1x = ny * az - nz * ay; val c1y = nz * ax - nx * az; val c1z = nx * ay - ny * ax
      val c2x = cy2 * nz - cz2 * ny; val c2y = cz2 * nx - cx2 * nz; val c2z = cx2 * ny - cy2 * nx
      val within = (c1x * px + c1y * py + c1z * pz) >= 0 &&
        (c2x * px + c2y * py + c2z * pz) >= 0
      if (nn > 0 && within) {
        val d = math.asin(math.min(1.0, math.abs(pn) / math.sqrt(nn)))
        if (d < bestD) {
          // foot of perpendicular: p projected onto the edge plane
          val fx = px * nn - pn * nx; val fy = py * nn - pn * ny; val fz = pz * nn - pn * nz
          val fm = math.sqrt(fx * fx + fy * fy + fz * fz)
          if (fm > 0) { bestD = d; bx = fx / fm; by = fy / fm; bz = fz / fm }
        }
      } else {
        val dA = chordDist(ax, ay, az)
        if (dA < bestD) { bestD = dA; bx = ax; by = ay; bz = az }
        val dB = chordDist(cx2, cy2, cz2)
        if (dB < bestD) { bestD = dB; bx = cx2; by = cy2; bz = cz2 }
      }
      i += 1
    }
    val lng = math.toDegrees(math.atan2(by, bx))
    val lat = math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, bz))))
    UTF8String.fromString(s"""{"type":"Point","coordinates":[$lng,$lat]}""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoClosestPointOnLine =
    copy(children = newChildren)

  override def prettyName: String = "geo_closest_point_on_line"
}

/** `geo_s2cell_parent(token [, level])` — the containing cell's token at
  * `level` (default: one level coarser). Pure id arithmetic on the public
  * S2 cell-id layout (s2geometry.io: 3 face bits, 2 bits per level, trailing
  * one at the level's lsb): parent = clear the position bits below the
  * target level and set its lsb. Null on a malformed token, a level
  * outside [0, cell level], or a non-integral level.
  */
case class GeoS2CellParent(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.head.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("geo_s2cell_parent token must be a string")
    else if (children.size == 2 && !children(1).dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure("geo_s2cell_parent level must be numeric")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val t = children.head.eval(input)
    if (t == null) return null
    val id = S2Cell.idFromToken(t.asInstanceOf[UTF8String].toString)
    if (id == 0L) return null
    val cur = S2Cell.levelOf(id)
    val target = if (children.size == 2) {
      val l = children(1).eval(input)
      if (l == null) return null
      val d = ShapeArg.num(l)
      if (d != math.floor(d) || d.isNaN) return null
      d.toInt
    } else cur - 1
    if (target < 0 || target > cur) null
    else UTF8String.fromString(S2Cell.token(S2Cell.parentId(id, target)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GeoS2CellParent = copy(children = newChildren)

  override def prettyName: String = "geo_s2cell_parent"
}

/** `geo_s2cell_children(token)` — the four child tokens one level finer,
  * sorted (deterministic). Child ids sit at ±lsb/4 and ±3·lsb/4 around the
  * parent center (the id layout's subdivision step). Null on a malformed
  * token or a leaf cell (level 30 has no children).
  */
case class GeoS2CellChildren(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("geo_s2cell_children token must be a string")

  override protected def nullSafeEval(input: Any): Any = {
    val id = S2Cell.idFromToken(input.asInstanceOf[UTF8String].toString)
    if (id == 0L || S2Cell.levelOf(id) >= 30) null
    else {
      val toks = S2Cell.childIds(id).map(S2Cell.token).sorted
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(UTF8String.fromString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GeoS2CellChildren =
    copy(child = newChild)

  override def prettyName: String = "geo_s2cell_children"
}
