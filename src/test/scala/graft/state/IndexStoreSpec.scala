package graft.state

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.SimilarityFunctions

/** Index-artifact persistence: publish once, load everywhere — including a
  * fresh SparkSession — with staleness guarded by corpus fingerprints.
  */
class IndexStoreSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private val corpus = s"$sf/embeddings.parquet"

  private def withIndexDir[A](body: String => A): A = {
    val dir = tmpDir("graft-index")
    spark.conf.set("spark.graft.index.dir", dir)
    try body(dir)
    finally {
      spark.conf.unset("spark.graft.index.dir")
      SimilarityFunctions.releaseIndexCaches()
    }
  }

  test("loadOrTrainPq round-trips the codebook and never retrains a published artifact") {
    withIndexDir { dir =>
      val emb = spark.read.parquet(corpus)
      val cb = SimilarityFunctions.pqTrain(emb, "embedding", "vec_id", m = 8, k = 16, dim = 64)
      val art = s"$dir/pq_roundtrip"
      assert(IndexStore.loadOrTrainPq(spark, art)(cb) == cb)
      // second call must take the disk path: a poison thunk proves it
      val loaded = IndexStore.loadOrTrainPq(spark, art)(
        fail("retrained despite a published artifact"))
      assert(loaded == cb)
    }
  }

  test("PQ codebook trained in one session reloads identically in a fresh session") {
    withIndexDir { dir =>
      SimilarityFunctions.releaseIndexCaches()
      val emb = spark.read.parquet(corpus)
      val cb = SimilarityFunctions.cachedPqTrain(
        emb, "embedding", "vec_id", m = 8, k = 16, dim = 64, cacheKey = corpus)
      val codes = SimilarityFunctions.pqEncode(emb, "embedding", "vec_id", cb)
        .orderBy("id").collect().map(_.getSeq[Int](1))

      // fresh session state + cleared JVM memo: only the disk artifact remains
      SimilarityFunctions.releaseIndexCaches()
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.index.dir", dir)
      val emb2 = s2.read.parquet(corpus)
      val cb2 = SimilarityFunctions.cachedPqTrain(
        emb2, "embedding", "vec_id", m = 8, k = 16, dim = 64, cacheKey = corpus)
      assert(cb2 == cb)
      val codes2 = SimilarityFunctions.pqEncode(emb2, "embedding", "vec_id", cb2)
        .orderBy("id").collect().map(_.getSeq[Int](1))
      assert(codes2.toSeq == codes.toSeq)

      // and the reload really was a LOAD: the artifact decodes to the same
      // codebook under a poison train thunk
      val fp = IndexStore.fingerprint(spark, corpus)
      val art = s"$dir/pq_${fp}_embedding_m8_k16_d64"
      assert(IndexStore.loadOrTrainPq(spark, art)(
        fail("retrained despite a published artifact")) == cb)
    }
  }

  test("IVF centroids persist and gate sim queries identically after reload") {
    withIndexDir { dir =>
      SimilarityFunctions.releaseIndexCaches()
      val emb = spark.read.parquet(corpus)
      val cents = SimilarityFunctions.cachedKmeansCentroids(
        emb, "embedding", "vec_id", k = 16, iters = 2, cacheKey = corpus)
      SimilarityFunctions.releaseIndexCaches()
      val cents2 = SimilarityFunctions.cachedKmeansCentroids(
        emb, "embedding", "vec_id", k = 16, iters = 2, cacheKey = corpus)
      assert(cents2 == cents)
      val fp = IndexStore.fingerprint(spark, corpus)
      assert(IndexStore.loadOrTrainCentroids(spark, s"$dir/ivf_${fp}_embedding_k16_i2")(
        fail("retrained despite a published artifact")) == cents)
    }
  }

  test("fingerprint changes when corpus data changes (stale index can never serve)") {
    val d = tmpDir("fp-corpus")
    val f = Paths.get(d, "part-0.parquet")
    Files.write(f, Array[Byte](1, 2, 3))
    val fp1 = IndexStore.fingerprint(spark, d)
    // appending bytes changes length (mtime granularity alone is too coarse
    // to assert on in a fast test)
    Files.write(f, Array[Byte](4), StandardOpenOption.APPEND)
    val fp2 = IndexStore.fingerprint(spark, d)
    assert(fp1 != fp2)
    // absent paths still fingerprint (distinct per key string)
    assert(IndexStore.fingerprint(spark, "no/such/path") !=
      IndexStore.fingerprint(spark, "other/missing/path"))
  }
}
