package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>` / `array<double>`), expression-only (codegen'd):
  *
  *  - `cosine` / `dot`: `zip_with` product + `aggregate` sum — sequential
  *    left-to-right summation, so results are bit-reproducible run-to-run.
  *  - brute-force top-k: broadcast the (small) query set against the corpus,
  *    rank per query — the exact baseline; corpus-side scan is
  *    embarrassingly parallel, no corpus shuffle at any scale.
  *  - LSH (random hyperplanes): per-row bucket signature from `nPlanes`
  *    fixed seeded hyperplanes; candidate generation is a bucket equi-join —
  *    the 100 TB path (corpus shuffles once on bucket, queries broadcast).
  */
object SimilarityFunctions {

  /** Sequential-sum dot product of two array columns — the native codegen'd
    * [[graft.functions.expressions.VectorDot]] expression (primitive loop,
    * no per-pair allocation; requires `graft.GraftSessionExtensions` on the
    * session, which every entry point registers). Bit-identical to the
    * `aggregate(zip_with(...))` form it replaced.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorDot.vectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for each query row (small set —
    * broadcast), the `k` nearest corpus rows by rounded cosine with a
    * deterministic id tie-break.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Matryoshka-style truncated-prefix ANN: shortlist on the first
    * `prefixDim` dimensions (an MRL embedding packs coarse similarity into
    * the leading coordinates, so the truncated dot is a dim/prefixDim-×
    * cheaper scoring pass), then exact re-rank of the shortlist on the full
    * vector. The scale shape: the expensive full-dim scoring touches only
    * `shortlist` candidates per query instead of the corpus.
    */
  def mrlTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      prefixDim: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_trunc",
        cosine(slice(col("qv"), 1, prefixDim), slice(col("cv"), 1, prefixDim)))
    val w1 = Window.partitionBy("query_id").orderBy(col("cos_trunc").desc, col("neighbor_id"))
    val short = scored.withColumn("srank", row_number().over(w1))
      .filter(col("srank") <= shortlist)
    val w2 = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    short
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Sign-bit binarization of a ≤64-dim embedding into ONE long: bit i set
    * iff v[i] > 0. 256× compression at dim 64 (float32 → 1 bit/dim) —
    * the extreme end of the compression ladder (float → int8 → PQ 4-bit →
    * sign bit), with Hamming distance as the codegen'd `bit_count(a ^ b)`.
    */
  def signPack(vecCol: String): Column =
    // >64 dims would silently wrap shiftleft's 6-bit shift amount — fail loud
    expr(s"CASE WHEN size($vecCol) > 64 THEN " +
      s"CAST(raise_error('signPack: dim > 64, pack into multiple words') AS BIGINT) " +
      s"ELSE aggregate(sequence(0, size($vecCol) - 1), CAST(0 AS BIGINT), " +
      s"(acc, i) -> CASE WHEN element_at($vecCol, i + 1) > 0 THEN " +
      "acc | shiftleft(CAST(1 AS BIGINT), i) ELSE acc END) END")

  /** Exact Hamming top-k over sign-packed signatures: queries broadcast,
    * distance is one XOR + popcount per pair, ties break on the id —
    * fully deterministic (no tolerance gate needed, unlike the
    * float-scoring ANN paths).
    */
  def hammingTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, k: Int): DataFrame = {
    val sig = corpus.select(col(idCol).as("vec_id"), signPack(vecCol).as("sig"))
    val q = sig.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig"))
    val w = Window.partitionBy("q_id").orderBy(col("ham"), col("vec_id"))
    sig.crossJoin(broadcast(q))
      .withColumn("ham", expr("CAST(bit_count(sig ^ q_sig) AS INT)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("ham"))
  }

  /** Deterministic random hyperplanes: `nPlanes` × `dim` doubles. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for cosine similarity: bit p = (v · plane_p) > 0,
    * packed into a long. Same-bucket vectors are cosine-close with high
    * probability; nearby buckets differ in few bits.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** ANN top-k: candidates = corpus rows sharing a query's LSH bucket in ANY
    * of `nTables` independent hash tables (OR-amplification — recall
    * ≈ 1-(1-p^nPlanes)^nTables for per-plane agreement p), ranked by exact
    * cosine within the deduplicated candidate set. Candidate volume
    * ≈ corpus × nTables / 2^nPlanes; the bucket join carries ids only (the
    * vectors join back once per surviving candidate), queries broadcast —
    * no cross product at any scale.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8,
      nTables: Int = 1,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    def buckets(v: Column): Column = array((0 until nTables).map { t =>
      lshBucket(v, hyperplanes(nPlanes, dim, seed + t))
    }: _*)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cB = c.select(col("neighbor_id"),
      posexplode(buckets(col("cv"))).as(Seq("table", "bucket")))
    val qB = q.select(col("query_id"),
      posexplode(buckets(col("qv"))).as(Seq("table", "bucket")))
    // candidate ids first (a pair colliding in several tables scores once),
    // vectors joined back after the dedup
    val cand = cB.join(broadcast(qB), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF-style ANN: corpus rows are assigned to their nearest of `centroids`
    * (the coarse quantizer — pass k-means output, or a deterministic sample);
    * each query probes its `nProbe` nearest centroid cells and ranks exact
    * cosine only inside them. The classic recall/compute dial: candidate
    * count ≈ corpus × nProbe / nCells, and the corpus shuffles once on the
    * cell id — the IVF flavor of [[lshTopK]].
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[Seq[Double]],
      nProbe: Int = 2): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", nearestCells(col("cv"), centroids, 1).getItem(0).getField("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cell", explode(nearestCells(col("qv"), centroids, nProbe).getField("cell")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
      .select("query_id", "neighbor_id", "cos")
      .distinct() // a neighbor can appear via several probed cells
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-query recall of `ann` against the exact `answer` top-k: both inputs
    * shaped (query_id, neighbor_id, …). THE one definition shared by the
    * oracle gates (Surface) and the threshold-calibration probe
    * (tools.GateProbe) — gate thresholds are calibrated from this exact
    * computation, so the two must never drift apart.
    */
  def recallAtK(exact: DataFrame, ann: DataFrame): DataFrame =
    exact
      .join(ann.select(col("query_id"), col("neighbor_id"), lit(1).as("_f")),
        Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy("query_id")
      .agg((sum(coalesce(col("_f"), lit(0))) / count(lit(1))).as("recall"))

  /** Deterministic CLUSTERED corpus synthesized from an embeddings table:
    * member `id`'s vector = centroid(id % nClusters) + noiseScale × the
    * member's own embedding, over ids in [nClusters, nClusters + nMembers).
    * With noiseScale well under 1 the centroid term dominates, so
    * same-cluster cosines sit near 1/(1 + noiseScale²) — the structured
    * happy path for sign-LSH, complementing the near-orthogonal-noise corpus
    * (sign-LSH's worst case) the base ANN gate runs on. Fully in-plan and
    * seed-free: both terms come from the source table, so the construction
    * is identical across runs and engines.
    */
  def clusteredCorpus(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      nMembers: Int,
      noiseScale: Double): DataFrame = {
    val cent = emb.filter(col(idCol) < nClusters)
      .select(col(idCol).as("c"), col(vecCol).as("cvec"))
    emb.filter(col(idCol) >= nClusters && col(idCol) < nClusters + nMembers)
      .select(col(idCol), (col(idCol) % nClusters).as("c"), col(vecCol).as("nvec"))
      .join(broadcast(cent), Seq("c"))
      .select(col(idCol),
        zip_with(col("cvec"), col("nvec"), (x, y) => x + y * lit(noiseScale)).as(vecCol))
  }

  /** Deterministic coarse quantizer for tests/benches: the first `nCells`
    * corpus vectors (a real deployment would plug k-means centroids in).
    */
  def leadingCentroids(corpus: DataFrame, vecCol: String, idCol: String, nCells: Int): Seq[Seq[Double]] =
    corpus.orderBy(col(idCol)).limit(nCells).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq

  /** Distributed SPHERICAL k-means over the embedding column — the real IVF
    * coarse quantizer for a cosine metric. Assignment by cosine (matching
    * [[ivfTopK]]'s probe metric); the update step averages UNIT-NORMALIZED
    * members — the actual maximizer of the within-cell cosine objective (a
    * raw-vector mean lets one long vector drag the centroid direction away
    * from the majority). Init = the first `k` corpus vectors by id
    * ([[leadingCentroids]]). Each iteration is ONE shuffle: assign cells
    * per row (expression-only, centroids inlined as literals), then
    * posexplode+partial-agg the per-cell per-dimension means — no vector
    * ever lands on the driver except the k×dim centroid matrix itself,
    * which is bounded by construction. Cells that lose all members keep
    * their previous centroid (classic empty-cluster guard).
    *
    * Determinism: seeded init and a fixed iteration count make the result
    * deterministic in single-process (local) execution; on a multi-executor
    * cluster, float partial-sum merge order can differ in ULPs run-to-run,
    * so treat cluster-built centroids as an artifact to persist with the
    * index, not something to recompute and compare bit-for-bit.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int = 2): Seq[Seq[Double]] = {
    var centroids = leadingCentroids(corpus, vecCol, idCol, k)
    for (_ <- 1 to iters)
      centroids = lloydUpdate(corpus, vecCol, centroids)
    centroids
  }

  /** One spherical-Lloyd update round: assign each row to its nearest-cosine
    * centroid, average the UNIT-NORMALIZED members per cell/dimension (one
    * shuffle; only the k×dim centroid matrix reaches the driver), keep the
    * previous centroid for cells that lost every member.
    */
  private def lloydUpdate(
      corpus: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val assigned = corpus
      .select(col(vecCol).as("v"))
      .withColumn("nv", transform(col("v"), x => x.cast("double") / norm(col("v"))))
      .withColumn("cell", nearestCells(col("v"), centroids, 1).getItem(0).getField("cell"))
    val means = assigned
      .select(col("cell"), posexplode(col("nv")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(avg(col("x")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    centroids.indices.map(i => means.getOrElse(i, centroids(i)))
  }

  /** Power-iteration PCA trace for the gated embed_pca query: the top
    * principal direction of the mean-centered corpus, found by `iters`
    * rounds of v ← C·v / ‖C·v‖ WITHOUT ever materializing the covariance
    * matrix — each round is one distributed pass computing s = (x−μ)·v per
    * row and partial-aggregating Σ s·(x−μ) per dimension, so the driver
    * only ever holds μ, v and the per-round Rayleigh quotients (dim-sized
    * arrays and scalars; the 100 TB shape for covariance work). Init is the
    * deterministic uniform unit vector. The Rayleigh quotient of power
    * iterates on a PSD matrix is monotonically non-decreasing — the gated
    * query asserts exactly that, which a wrong centering or aggregation
    * lowering breaks.
    *
    * Returns (n, dim, rayleighs) with `iters + 1` Rayleigh values
    * (variance of the projection onto v, measured before the first and
    * after every update).
    */
  def pcaTrace(corpus: DataFrame, vecCol: String, iters: Int): (Long, Int, Seq[Double]) = {
    val xd = corpus.select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .filter(col("v").isNotNull)
    val dim = xd.select(size(col("v"))).head().getInt(0)
    val mu = xd.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg(col("x")).as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
    val muCol = array(mu.map(lit): _*)
    var v = Seq.fill(dim)(1.0 / math.sqrt(dim))
    val rayleighs = Seq.newBuilder[Double]
    var n = 0L
    for (t <- 0 to iters) {
      val vCol = array(v.map(lit): _*)
      val cent = zip_with(col("v"), muCol, (a, b) => a - b)
      val s = aggregate(zip_with(cent, vCol, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
      val scored = xd.select(cent.as("c"), s.as("s"))
      val row = scored.agg(count(lit(1)).as("n"), avg(col("s") * col("s")).as("r")).head()
      n = row.getLong(0)
      rayleighs += row.getDouble(1)
      if (t < iters) {
        val w = scored.select(col("s"), posexplode(col("c")).as(Seq("pos", "cv")))
          .groupBy("pos").agg(sum(col("cv") * col("s")).as("w"))
          .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
        val norm2 = math.sqrt(w.map(x => x * x).sum)
        if (norm2 > 0) v = w.map(_ / norm2).toSeq
      }
    }
    (n, dim, rayleighs.result())
  }

  /** Lloyd-iteration trace for the gated embed_kmeans query: `iters` update
    * rounds from the leading-k init, measuring the spherical objective
    * inertia = Σ(1 − cos(x, nearest centroid)) before the first and after
    * every update — `iters + 1` values. Each measurement and each update is
    * one distributed pass; the driver only ever holds the k×dim matrix and
    * the scalar inertias. Lloyd's invariant — both the assignment and the
    * normalized-mean update improve the cosine objective — makes the trace
    * non-increasing; the gated query asserts exactly that (an incorrect
    * mean/assignment lowering would break monotonicity), so the property
    * check is NOT vacuous re-evaluation of the same expression.
    */
  def kmeansTrace(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int): (Long, Seq[Double]) = {
    var centroids = leadingCentroids(corpus, vecCol, idCol, k)
    val inertias  = Seq.newBuilder[Double]
    var n = 0L
    for (i <- 0 to iters) {
      val best = corpus.select(col(vecCol).as("v"))
        .withColumn("b", nearestCells(col("v"), centroids, 1).getItem(0))
      val row = best.agg(count(lit(1)).as("n"),
        sum(lit(1.0) - col("b.s")).as("inertia")).head()
      n = row.getLong(0)
      inertias += row.getDouble(1)
      if (i < iters) centroids = lloydUpdate(corpus, vecCol, centroids)
    }
    (n, inertias.result())
  }

  // an IVF quantizer is BUILT ONCE and queried many times — recomputing the
  // Lloyd iterations per query would be re-building the index on every
  // lookup. Keyed by (corpus identity, columns, k, iters); callers use a
  // content-versioned key (like the SF dir) so a cached entry only outlives
  // unchanged data. The cache hands back ONE build artifact — which is also
  // the right posture on a cluster, where recomputation is not bit-stable
  // (see kmeansCentroids).
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, Int, Int), Seq[Seq[Double]]]()

  /** [[kmeansCentroids]] memoized under `cacheKey` (e.g. the corpus path)
    * AND persisted via [[graft.state.IndexStore]]: the first session to
    * need the quantizer trains and publishes it; every later session —
    * fresh JVM included — loads the identical artifact instead of
    * re-running Lloyd iterations (which on a cluster would not even be
    * bit-stable). The artifact path embeds a content fingerprint of the
    * corpus, so changed data retrains rather than serving a stale index.
    */
  def cachedKmeansCentroids(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int,
      cacheKey: String): Seq[Seq[Double]] = {
    val spark = corpus.sparkSession
    val fp = graft.state.IndexStore.fingerprint(spark, cacheKey)
    centroidCache.computeIfAbsent((fp, vecCol, idCol, k, iters), _ =>
      graft.state.IndexStore.loadOrTrainCentroids(spark,
        s"${graft.state.IndexStore.baseDir(spark)}/ivf_${fp}_${vecCol}_k${k}_i$iters")(
        kmeansCentroids(corpus, vecCol, idCol, k, iters)))
  }

  /** The `n` nearest centroid cells of `v` by cosine, as an array of
    * struct(score, cell) — shared by [[ivfTopK]] and [[kmeansCentroids]].
    */
  private[functions] def nearestCells(v: Column, centroids: Seq[Seq[Double]], n: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(v, array(c.map(lit): _*)).as("s"), lit(i).as("cell"))
    }: _*)
    slice(reverse(array_sort(scored)), 1, n)
  }

  // ---- product quantization (the compressed 100 TB ANN path) --------------

  /** Inline a PQ codebook as a nested literal array column (m×k×dsub —
    * bounded by construction, stays in codegen).
    */
  private def pqCodebookCol(cb: Seq[Seq[Seq[Double]]]): Column =
    array(cb.map(sub => array(sub.map(cent => array(cent.map(lit): _*)): _*)): _*)

  /** Nearest codebook cell (0-based) of subvector `sv` within subspace
    * `sub`, by squared L2 — expression-only, no UDF.
    */
  private def pqNearestCell(sv: Column, sub: Column, cbCol: Column): Column = {
    val dists = transform(element_at(cbCol, sub + 1), cent =>
      aggregate(zip_with(sv, cent, (a, b) => (a - b) * (a - b)), lit(0.0d), _ + _))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Train a product quantizer on UNIT-NORMALIZED vectors: `m` subspaces of
    * `dim/m` dims, `k` centroids each, `iters` Lloyd rounds. Normalization
    * makes PQ's squared-L2 ranking order match cosine (L2² = 2 − 2cos), so
    * [[pqTopK]] results gate against the exact cosine top-k.
    *
    * Scale shape: each round is ONE job — subspaces explode alongside rows
    * (m small rows per vector), assignment is expression-only against the
    * inlined codebook, and the update collects m×k×dsub MEANS, never
    * vectors. The returned codebook is the INDEX ARTIFACT: persist it with
    * the codes; on a cluster, float merge order differs in ULPs run-to-run
    * (same caveat as [[kmeansCentroids]]).
    */
  def pqTrain(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int,
      k: Int,
      dim: Int,
      iters: Int = 2): Seq[Seq[Seq[Double]]] = {
    val dsub = dim / m
    require(m * dsub == dim, s"dim $dim must split into $m equal subspaces")
    val base = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nv", transform(col("v"), x => x.cast("double") / norm(col("v"))))
    val lead = base.orderBy(col("id")).limit(k).select(col("nv")).collect()
      .map(_.getSeq[Double](0).toSeq)
    require(lead.length == k, s"pqTrain needs at least $k vectors, got ${lead.length}")
    var cb: Seq[Seq[Seq[Double]]] =
      (0 until m).map(i => lead.toSeq.map(_.slice(i * dsub, i * dsub + dsub)))
    for (_ <- 1 to iters) {
      val cbCol = pqCodebookCol(cb)
      val subs = base.select(
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          i => slice(col("nv"), i * dsub + 1, lit(dsub)))).as(Seq("sub", "sv")))
      val means = subs
        .withColumn("cell", pqNearestCell(col("sv"), col("sub"), cbCol))
        .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("sub", "cell", "pos").agg(avg(col("x")).as("mv"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) => key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq }
      // empty cells keep their previous centroid (empty-cluster guard)
      cb = (0 until m).map(i => (0 until k).map(c => means.getOrElse((i, c), cb(i)(c))))
    }
    cb
  }

  /** Encode each vector as its per-subspace nearest-cell indices —
    * `array<int>` of length m (4 bits of information per entry at k=16: a
    * 32× compression of a 64-dim float vector, the storage that makes
    * 100 TB of embeddings scannable). One expression per row, no explode,
    * no UDF.
    */
  def pqEncode(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      cb: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = cb.size
    val dsub = cb.head.head.size
    val cbCol = pqCodebookCol(cb)
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nv", transform(col("v"), x => x.cast("double") / norm(col("v"))))
      .select(col("id"), transform(sequence(lit(0), lit(m - 1)),
        i => pqNearestCell(slice(col("nv"), i * dsub + 1, lit(dsub)), i, cbCol)).as("code"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    * full-precision; per (query, subspace, cell) squared distances form a
    * Q×m×k lookup TABLE (640 doubles for 5 queries at 8×16 — driver-built,
    * broadcast), so scoring a vector is m table lookups + a sum. Spark
    * shape: codes explode to (id, sub, cell) ONCE (query-independent),
    * broadcast-join the table, ONE partial-friendly groupBy sums the m
    * parts per (query, vector), and a query-partitioned window takes the
    * top-k — no full-precision vector is ever read at search time.
    */
  def pqTopK(
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cb: Seq[Seq[Seq[Double]]]): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val m = cb.size
    val dsub = cb.head.head.size
    val qs = queries.select(col(idCol), col(vecCol)).collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val n = math.sqrt(v.map(x => x * x).sum)
      (r.getLong(0), v.map(_ / n))
    }
    val dt = for {
      (qid, qv) <- qs.toSeq
      i <- 0 until m
      (cent, c) <- cb(i).zipWithIndex
    } yield (qid, i, c,
      (0 until dsub).map { p => val d = qv(i * dsub + p) - cent(p); d * d }.sum)
    val dtDf = dt.toDF("query_id", "sub", "cell", "d")
    val expl = codes.select(col("id").as("neighbor_id"),
      posexplode(col("code")).as(Seq("sub", "cell")))
    val scored = expl.join(broadcast(dtDf), Seq("sub", "cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(sum(col("d")), 6).as("adist"))
    val w = Window.partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adist", "rank")
  }

  /** The production PQ search shape: ADC over codes generates a SHORTLIST
    * (`shortlist` × larger than k), then ONLY the shortlisted vectors are
    * fetched full-precision (id equi-join) and re-ranked by exact cosine.
    * Random/unstructured embeddings are PQ's distortion worst case — the
    * re-rank recovers exact-metric ordering as long as the true neighbors
    * make the shortlist, which is what the recall gate measures. At scale
    * the expensive full-precision read touches `Q × shortlist` rows, never
    * the corpus.
    */
  def pqRerankTopK(
      codes: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int,
      cb: Seq[Seq[Seq[Double]]]): DataFrame = {
    val cand = pqTopK(codes, queries, idCol, vecCol, shortlist, cb)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val rescored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** The production ANN composition — IVF coarse routing × PQ-ADC scoring
    * × exact re-rank, the shape real 100 TB vector search runs:
    *
    *   1. INDEX side (one corpus pass; both artifacts persist via
    *      [[graft.state.IndexStore]]): every vector gets its nearest coarse
    *      cell AND its m-subspace PQ code.
    *   2. Each query probes its `nProbe` nearest cells; the candidate set
    *      is the probed cells' rows ONLY (≈ corpus × nProbe / nCells —
    *      never the full corpus, unlike flat [[pqTopK]]).
    *   3. Candidates are scored by ADC against the broadcast Q×m×k
    *      distance table — m integer lookups + a sum per row, codes only,
    *      no full-precision reads.
    *   4. The `shortlist` best per query fetch their float vectors by id
    *      equi-join and re-rank by exact cosine for the final top-k.
    *
    * Spark shape: the corpus shuffles ONCE (the per-(query, neighbor) ADC
    * sum); cell routing and the distance table ride broadcast joins, and
    * the full-precision re-rank touches Q × shortlist rows. Recall dials:
    * nProbe (cells searched) and shortlist (ADC error absorbed).
    */
  def ivfpqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[Seq[Double]],
      cb: Seq[Seq[Seq[Double]]],
      nProbe: Int = 2,
      shortlist: Int = 100): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m    = cb.size
    val dsub = cb.head.head.size
    val cbCol = pqCodebookCol(cb)
    // index pass: coarse cell + PQ code per corpus row (cosine is
    // norm-invariant, so cell assignment on nv matches ivfTopK's on v)
    val indexed = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
      .withColumn("nv", transform(col("v"), x => x.cast("double") / norm(col("v"))))
      .select(col("neighbor_id"),
        nearestCells(col("nv"), centroids, 1).getItem(0).getField("cell").as("cell"),
        transform(sequence(lit(0), lit(m - 1)),
          i => pqNearestCell(slice(col("nv"), i * dsub + 1, lit(dsub)), i, cbCol)).as("code"))
    // query probes (in-plan, same nearestCells ordering as the index side)
    val qprobes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"),
        explode(nearestCells(col("qv"), centroids, nProbe).getField("cell")).as("cell"))
    // ADC distance table: query × subspace × codebook cell, driver-built
    val qs = queries.select(col(idCol), col(vecCol)).collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val n = math.sqrt(v.map(x => x * x).sum)
      (r.getLong(0), v.map(_ / n))
    }
    val dt = for {
      (qid, qv) <- qs.toSeq
      i <- 0 until m
      (cent, c) <- cb(i).zipWithIndex
    } yield (qid, i, c,
      (0 until dsub).map { p => val d = qv(i * dsub + p) - cent(p); d * d }.sum)
    val dtDf = dt.toDF("query_id", "sub", "pcell", "d")
    // route → explode codes → ADC sum (a corpus row joins at most nProbe
    // queries, each (query, neighbor) pair appears exactly once)
    val scored = indexed
      .join(broadcast(qprobes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        posexplode(col("code")).as(Seq("sub", "pcell")))
      .join(broadcast(dtDf), Seq("query_id", "sub", "pcell"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(round(sum(col("d")), 6).as("adist"))
    val wS = Window.partitionBy("query_id").orderBy(col("adist").asc, col("neighbor_id").asc)
    val cand = scored.withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    // exact cosine re-rank of the shortlist
    val qfull = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val rescored = cand
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        Seq("neighbor_id"))
      .join(broadcast(qfull), Seq("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    rescored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int, Int, Int), Seq[Seq[Seq[Double]]]]()

  /** [[pqTrain]] memoized under `cacheKey` and persisted via
    * [[graft.state.IndexStore]] — the PQ codebook is an index artifact
    * built once per corpus and MUST ship with the codes it produced
    * (codes are meaningless under any other codebook), exactly like
    * [[cachedKmeansCentroids]].
    */
  def cachedPqTrain(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int,
      k: Int,
      dim: Int,
      cacheKey: String): Seq[Seq[Seq[Double]]] = {
    val spark = corpus.sparkSession
    val fp = graft.state.IndexStore.fingerprint(spark, cacheKey)
    pqCache.computeIfAbsent((fp, vecCol, m, k, dim), _ =>
      graft.state.IndexStore.loadOrTrainPq(spark,
        s"${graft.state.IndexStore.baseDir(spark)}/pq_${fp}_${vecCol}_m${m}_k${k}_d$dim")(
        pqTrain(corpus, vecCol, idCol, m, k, dim)))
  }

  /** Drop the in-JVM index memos (NOT the persisted artifacts) — forces
    * the next cached call through [[graft.state.IndexStore]]'s disk path.
    * Test hook, mirroring [[DedupFunctions.releaseCaches]].
    */
  def releaseIndexCaches(): Unit = {
    centroidCache.clear()
    pqCache.clear()
  }

  /** Embedding-cosine near-duplicate pairs via OR-amplified LSH: `nTables`
    * independent hash tables of `nPlanes` sign-bits each; a pair is a
    * candidate if it collides in ANY table (recall ≈ 1-(1-p^nPlanes)^nTables
    * for per-plane agreement p), then exact cosine ≥ `threshold` filters.
    * The embedding flavor of [[DedupFunctions.minHashNearDups]]: candidate
    * generation is one equi-join on (table, bucket) — the corpus shuffles
    * once, never a cross product.
    */
  def cosineNearDups(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nPlanes: Int = 4,
      nTables: Int = 6,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val buckets = array((0 until nTables).map { t =>
      lshBucket(col("v"), hyperplanes(nPlanes, dim, seed + t))
    }: _*)
    // bucket self-join carries only (table, bucket, id) — never the vectors;
    // dedup to unique id pairs BEFORE any cosine so each pair is scored once
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nv", transform(col("v"), x => x.cast("double") / norm(col("v"))))
    val ids = base.select(col("id"), posexplode(buckets).as(Seq("table", "bucket")))
    val pairs = ids.select(col("table"), col("bucket"), col("id").as("id_a"))
      .join(ids.select(col("table"), col("bucket"), col("id").as("id_b")), Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // a pair can collide in several tables
    // pre-normalized vectors make per-pair cosine a single dot product (no
    // per-pair norm recomputation)
    val vecs = base.select(col("id"), col("nv"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("nv").as("nv_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("nv").as("nv_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(dot(col("nv_a"), col("nv_b")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
