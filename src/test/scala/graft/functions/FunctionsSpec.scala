package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.types.KustoTypes

class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and the cat"),
    (1L, "the quick brown fox jumps over the lazy dog and the cat"),   // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog and the rat"),   // near dup of 0
    (3L, "der schnelle braune fuchs springt und der hund und die katze"),
    (4L, "completely unrelated text about spark query engines only")
  ).toDF("doc_id", "text")

  test("text: token counts, fingerprint, langid, quality") {
    val r = docs.select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.langId($"text").as("lang"),
      TextFunctions.qualityScore($"text").as("q")).collect()
    assert(r(0).getAs[Int]("n") == 12)
    assert(r(0).getAs[String]("fp") == r(1).getAs[String]("fp"))
    assert(r(0).getAs[String]("lang") == "en")
    assert(r(3).getAs[String]("lang") == "de")
    assert(r.forall(x => x.getAs[Double]("q") >= 0 && x.getAs[Double]("q") <= 1))

    // fingerprint is whitespace/case robust
    val fp2 = Seq("THE  quick   brown fox JUMPS over the lazy dog and the cat")
      .toDF("text").select(TextFunctions.fingerprint($"text")).head.getString(0)
    assert(fp2 == r(0).getAs[String]("fp"))

    // BPE-ish subword counting: splits at whitespace AND letter/digit
    // boundaries ("gpt4 turbo2x" → gpt|4 turbo|2|x = 5 pieces)
    val sw = Seq("gpt4 turbo2x", "plain words only")
      .toDF("text").select(TextFunctions.subwordCount($"text")).collect()
    assert(sw(0).getInt(0) == 5)
    assert(sw(1).getInt(0) == 3) // degenerates to whitespace tokens
  }

  test("word n-grams of a too-short document are empty, not an ANSI error") {
    // Spark 4 defaults ANSI on: an unguarded element_at past the token array
    // would THROW for any doc shorter than the gram order
    val short = Seq((1L, "hello world there"), (2L, "one two three four five six"))
      .toDF("id", "text").withColumn("tok", split($"text", " "))
    val grams = short.select($"id",
      TextFunctions.wordNGrams($"tok", 5).as("g")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(grams(1L).isEmpty)           // 3 tokens < 5 → zero 5-grams
    assert(grams(2L).size == 2)         // 6 tokens → two 5-grams
    assert(grams(2L).head == "one two three four five")
    // end-to-end: the minhash pipeline tolerates short docs
    val withShort = docs.unionByName(Seq((99L, "tiny doc")).toDF("doc_id", "text"))
    DedupFunctions.minHashNearDups(withShort, "doc_id", "text",
      threshold = 0.5, wordGrams = 5).collect() // must not throw
  }

  test("dedup: minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = DedupFunctions.minHashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // exact dup pair has jaccard 1.0
    val j = DedupFunctions.minHashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .filter($"id_a" === 0 && $"id_b" === 1).head.getDouble(2)
    assert(j == 1.0)
  }

  test("k-means centroids: deterministic, right shape, tighter than init") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val km  = SimilarityFunctions.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 2)
    val km2 = SimilarityFunctions.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 2)
    assert(km == km2)                         // fully deterministic
    assert(km.size == 4 && km.forall(_.size == 64))
    val init = SimilarityFunctions.leadingCentroids(vecs, "embedding", "vec_id", 4)
    assert(km != init)                        // Lloyd steps actually moved them
    // mean assignment cost must not get WORSE than the raw-vector init
    def cost(cs: Seq[Seq[Double]]): Double = {
      import org.apache.spark.sql.functions.{avg => favg}
      vecs.select(
        SimilarityFunctions.nearestCells(col("embedding"), cs, 1)
          .getItem(0).getField("s").as("best"))
        .agg(favg(col("best"))).head.getDouble(0)
    }
    assert(cost(km) >= cost(init) - 1e-9)
  }

  test("minhash recall gate FIRES when the LSH path is crippled (gate sensitivity)") {
    // the oracle gate pattern: exact ground truth joined against LSH output.
    // A healthy configuration finds the exact-dup pair; a crippled one
    // (bands=1 ⇒ collision needs the FULL 64-long signature equal, plus a
    // sky-high threshold estimate filter) misses near dups — the gate must
    // turn false, or it is decoration, not a gate
    val exact = DedupFunctions.exactJaccardPairs(docs, "doc_id", "text",
      wordGrams = 3, threshold = 0.5)
    assert(exact.count() >= 2) // (0,1) exact dup and (0,2)/(1,2) near dup

    def missed(lsh: org.apache.spark.sql.DataFrame): Long =
      exact.join(lsh.select($"id_a", $"id_b", lit(1).as("f")),
        Seq("id_a", "id_b"), "left_outer").filter($"f".isNull).count()

    val healthy = DedupFunctions.minHashNearDups(docs, "doc_id", "text",
      numHashes = 64, bands = 16, threshold = 0.5, wordGrams = 3)
    assert(missed(healthy) == 0, "healthy LSH must find every exact pair")

    val crippled = DedupFunctions.minHashNearDups(docs, "doc_id", "text",
      numHashes = 64, bands = 1, threshold = 0.95, wordGrams = 3)
    assert(missed(crippled) > 0, "crippled LSH must be CAUGHT by the gate")
  }

  test("dedup: simhash hamming 0 for exact dup, small for near dup") {
    val sh = DedupFunctions.simHash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) <= 12)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(4L)) > 12)
  }

  test("similarity: brute-force cosine topk exact, LSH recall on same bucket") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = SimilarityFunctions.bruteForceTopK(
      vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", k = 2).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // ranked by cosine
    assert(top.head.getDouble(2) > 0.99)

    val near = SimilarityFunctions.cosineNearDups(vecs, "vec_id", "embedding",
      threshold = 0.95, nPlanes = 4, dim = 4).collect()
    assert(near.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))

    // IVF: 2 cells around vec 0 and vec 2; query 0 probes both cells and
    // must still find its true nearest neighbor (vec 1) first
    val centroids = SimilarityFunctions.leadingCentroids(vecs, "embedding", "vec_id", 2)
      .take(1) ++ Seq(Seq(0.0, 1.0, 0.0, 0.0))
    val ivf = SimilarityFunctions.ivfTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 2, centroids, nProbe = 2).collect()
    assert(ivf.map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("multimodal: decode/feature/frame plumbing over binary payloads") {
    val corpus = Multimodal.syntheticCorpus(spark, 60)
    val dec = Multimodal.decode(corpus).collect()
    assert(dec.length == 60 && dec.forall(_.ok))
    assert(dec.forall(d => d.width >= 16 && d.height >= 16))
    assert(dec.filter(_.kind == "image").forall(_.duration_ms == 0L))

    val feats = Multimodal.extractFeatures(corpus, dim = 32).collect()
    assert(feats.forall(_.features.length == 32))
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3)) // normalized histogram

    val frames = Multimodal.sampleFrames(corpus)
    val kinds = corpus.collect().map(r => r.media_id -> r.kind).toMap
    assert(frames.select("media_id").distinct().collect()
      .forall(r => kinds(r.getLong(0)) == "video"))
  }

  test("multimodal: ImageIO decodes real PNG payloads exactly; truncation fails strictly") {
    import spark.implicits._
    // byte-level roundtrip: generated png decodes to its exact dimensions
    val png = Multimodal.syntheticPng(23, 17, seed = 7L)
    assert(Multimodal.decodeImage(png).contains((23, 17, 3)))
    assert(Multimodal.decodeImage(png.take(10)).isEmpty) // no signature+IHDR
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)

    // distributed path: real decode through mapPartitions, closed-form dims
    val rows = Seq(
      Multimodal.MediaRow(3L, "image", Multimodal.syntheticPng(19, 33, 3L), "image/png", "m://3"),
      Multimodal.MediaRow(5L, "image", Multimodal.syntheticPng(20, 20, 5L).take(10), "image/png", "m://5"),
      Multimodal.MediaRow(7L, "audio", Array[Byte](1, 2, 3), "application/x-audio", "m://7"))
    val ds  = spark.createDataset(rows)
    val dec = Multimodal.decodeStrict(ds).collect().map(d => d.media_id -> d).toMap
    assert(dec(3L).ok && dec(3L).width == 19 && dec(3L).height == 33 && dec(3L).n_channels == 3)
    assert(!dec(5L).ok && dec(5L).width == 0 && dec(5L).n_channels == 0)
    assert(!dec(7L).ok && dec(7L).n_channels == 0) // 3 raw bytes are not a WAV either
    // lenient decode falls back to the stub for unreadable image bytes
    val lenient = Multimodal.decode(ds).collect().map(d => d.media_id -> d).toMap
    assert(lenient(5L).ok && lenient(5L).width >= 16) // stub dims, still flowing
    assert(lenient(3L).width == 19)                   // real decode when readable
    assert(lenient(7L).ok)                            // unreadable audio → stub, still flowing
  }

  test("multimodal: javax.sound decodes real WAV payloads exactly; truncation fails strictly") {
    import spark.implicits._
    // byte-level roundtrip: generated wav decodes to its exact header stats
    val wav = Multimodal.syntheticWav(nFrames = 800, sampleRate = 8000, channels = 2, seed = 3L)
    assert(Multimodal.decodeAudio(wav).contains((2, 8000, 100L))) // 800 frames @ 8 kHz = 100 ms
    assert(Multimodal.decodeAudio(wav.take(10)).isEmpty)          // no RIFF/WAVE header
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)

    // distributed strict path on the closed-form corpus: channels, rate and
    // frame-exact duration all follow doc_id; truncated rows fail honestly
    val docsDf = Seq((1L, "a"), (4L, "b"), (7L, "c"), (10L, "d"))
      .toDF("doc_id", "source")
    val dec = Multimodal.decodeStrict(Multimodal.audioCorpusFromDocuments(docsDf))
      .collect().map(d => d.media_id -> d).toMap
    assert(dec.keySet == Set(1L, 4L, 7L, 10L))
    assert(dec(1L).ok && dec(1L).n_channels == 2 && dec(1L).sample_rate == 8000
      && dec(1L).duration_ms == 60L)   // 1+1%2=2 ch, 50+1*10 ms
    assert(dec(4L).ok && dec(4L).n_channels == 1 && dec(4L).duration_ms == 90L)
    assert(dec(7L).ok && dec(7L).n_channels == 2 && dec(7L).duration_ms == 120L)
    assert(!dec(10L).ok && dec(10L).n_channels == 0 && dec(10L).duration_ms == 0L) // 10 % 5 == 0: truncated
  }

  test("multimodal: PCM sample stats decode the signal, not just the header") {
    import spark.implicits._
    // closed-form check against the synthetic generator's sample formula
    val (frames, ch, seed) = (600, 2, 9L)
    val wav = Multimodal.syntheticWav(frames, 8000, ch, seed)
    val expected = for { f <- 0 until frames; c <- 0 until ch }
      yield ((seed * 31 + f * 7 + c * 13) & 0xffff).toShort.toLong
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav, "audio/wav", "m://1"),
      Multimodal.MediaRow(2L, "audio", wav.take(10), "audio/wav", "m://2"),
      Multimodal.MediaRow(3L, "image", Array[Byte](1), "image/png", "m://3"))
    val out = Multimodal.audioPcmStats(spark.createDataset(rows))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L)) // image rows don't enter the audio path
    assert(out(1L).getBoolean(4))
    assert(out(1L).getLong(1) == frames.toLong * ch)
    assert(out(1L).getLong(2) == expected.map(math.abs).sum)
    assert(out(1L).getLong(3) == expected.map(math.abs).max)
    assert(!out(2L).getBoolean(4) && out(2L).getLong(1) == 0L)
  }

  test("rolling_hash: codegen matches interpreted, registered in SQL, rejects non-strings") {
    import graft.functions.expressions.RollingHash
    val df = docs.select($"doc_id", $"text",
      RollingHash.rollingHash($"text").as("h"),
      expr("rolling_hash(text)").as("h_sql"))
    val rows = df.collect()
    rows.foreach { r =>
      val expected = RollingHash.hashBytes(r.getString(1).getBytes("UTF-8"))
      assert(r.getLong(2) == expected)       // codegen path == reference impl
      assert(r.getLong(3) == expected)       // SQL-registered path
    }
    // exact dups share a fingerprint; distinct texts don't (here)
    val h = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(h(0L) == h(1L) && h(0L) != h(4L))
    // null-safe + type check
    assert(Seq[Option[String]](None).toDF("text")
      .select(expr("rolling_hash(text)")).head.isNullAt(0))
    intercept[Exception](docs.select(expr("rolling_hash(doc_id)")).collect())
  }

  test("vector_dot: codegen matches HOF form, null on mismatch, mixed elem types") {
    import graft.functions.expressions.VectorDot
    val vecs = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
      (1L, Array(-1.5f, 0.0f, 2.5f), Array(2.0, -3.0, 0.5))).toDF("id", "vf", "vd")
    // reference arithmetic: sequential left-to-right double sum
    val hof = aggregate(
      zip_with($"vf", $"vd", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val rows = vecs.select(
      VectorDot.vectorDot($"vf", $"vd").as("native"),   // float × double
      VectorDot.vectorDot($"vf", $"vf").as("ff"),       // float × float
      expr("vector_dot(vd, vd)").as("dd_sql"),          // SQL-registered path
      hof.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(3))          // bit-identical to HOF
      assert(!r.isNullAt(1) && !r.isNullAt(2))
    }
    // length mismatch → NULL (zip_with null-pad parity), not an error
    val mm = Seq((Array(1.0f, 2.0f), Array(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(expr("vector_dot(a, b)"))
    assert(mm.head.isNullAt(0))
    // a null ELEMENT nulls the result too (HOF parity), never reads as 0
    val ne = spark.sql(
      "SELECT vector_dot(array(1.0d, cast(null as double)), array(1.0d, 2.0d))")
    assert(ne.head.isNullAt(0))
    // type check: non-array argument rejected
    intercept[Exception](vecs.select(expr("vector_dot(id, vf)")).collect())
  }

  test("types: Kusto mapping and tracking columns") {
    import org.apache.spark.sql.types._
    assert(KustoTypes.toKustoType(LongType) == "long")
    assert(KustoTypes.toKustoType(TimestampType) == "datetime")
    assert(KustoTypes.toKustoType(ArrayType(FloatType)) == "dynamic")
    assert(KustoTypes.fromKustoType("decimal") == DecimalType(38, 18))
    val s = StructType(Seq(StructField("id", LongType)))
    assert(KustoTypes.kustoSchemaString(s) == "['id']:long")
    assert(KustoTypes.withTrackingColumns(s).fieldNames.toSeq ==
      Seq("id", KustoTypes.BlobPathColumn, KustoTypes.IngestTsColumn))
  }

  test("chunkStarts: overlap lattice, exact-boundary tail, empty and null text") {
    import spark.implicits._
    val rows = Seq("a" * 10, "b" * 4, "c" * 8, "", null)
      .toDF("text")
      .select(TextFunctions.chunkStarts($"text", 4).as("s"))
      .collect().map(r => Option(r.getSeq[Int](0)).map(_.toSeq))
    // len 10, stride 4 → 0,4,8; len 4 → 0; len 8 → 0,4 (no start AT len);
    // empty/null → empty array (no throw from sequence(0,-1,+4))
    assert(rows(0).contains(Seq(0, 4, 8)))
    assert(rows(1).contains(Seq(0)))
    assert(rows(2).contains(Seq(0, 4)))
    assert(rows(3).contains(Seq.empty[Int]))
    assert(rows(4).contains(Seq.empty[Int]))
  }

  test("pcaTrace: Rayleigh non-decreasing, converges to the dominant axis") {
    import spark.implicits._
    // variance concentrated on axis 0 (values ±3) with axis-1 noise ±0.1:
    // power iteration must push the Rayleigh quotient toward ~9
    val vecs = Seq(
      Seq(3f, 0.1f, 0f), Seq(-3f, -0.1f, 0f), Seq(3f, -0.1f, 0f),
      Seq(-3f, 0.1f, 0f), Seq(2.9f, 0f, 0.1f), Seq(-2.9f, 0f, -0.1f))
      .toDF("embedding")
    val (n, dim, rq) = SimilarityFunctions.pcaTrace(vecs, "embedding", iters = 4)
    assert(n == 6L && dim == 3)
    assert(rq.length == 5)
    assert(rq.zip(rq.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(rq.last > 8.5) // dominant-axis variance ≈ (4·9 + 2·8.41)/6 ≈ 8.8
    assert(rq.head < 4.0) // uniform init mixes the quiet axes
  }

  test("kmeansTrace: inertia non-increasing over Lloyd rounds, n exact") {
    import spark.implicits._
    // two tight direction bundles + a stray: the k=2 trace must improve
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0.9f, 0.1f, 0f)), (2L, Seq(0.95f, 0f, 0.05f)),
      (3L, Seq(0f, 1f, 0f)), (4L, Seq(0.1f, 0.9f, 0f)), (5L, Seq(0f, 0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val (n, in) = SimilarityFunctions.kmeansTrace(vecs, "embedding", "vec_id", k = 2, iters = 2)
    assert(n == 6L)
    assert(in.length == 3)
    assert(in.zip(in.tail).forall { case (a, b) => b <= a + 1e-9 })
    // init = vecs 0,1 (both x-ish): round 1 must split out the y bundle
    assert(in.last < in.head)
  }
}
