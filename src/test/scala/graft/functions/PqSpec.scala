package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product quantization: codebook shape, code bounds, ADC+re-rank recall. */
class PqSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("pqTrain/pqEncode: 8x16 codebook over 64 dims, codes bounded, 32x smaller") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cb = SimilarityFunctions.pqTrain(emb, "embedding", "vec_id", m = 8, k = 16, dim = 64)
    assert(cb.size == 8 && cb.forall(_.size == 16) && cb.forall(_.forall(_.size == 8)))
    val codes = SimilarityFunctions.pqEncode(emb, "embedding", "vec_id", cb).collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val c = r.getSeq[Int](1)
      assert(c.size == 8) // 8 nibbles of information vs 64 floats: 32x
      assert(c.forall(x => x >= 0 && x < 16))
    }
    // training is deterministic in-process (seeded leading-vector init)
    val cb2 = SimilarityFunctions.pqTrain(emb, "embedding", "vec_id", m = 8, k = 16, dim = 64)
    assert(cb == cb2)
  }

  test("ADC shortlist + exact re-rank reaches the gated recall") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val cb = SimilarityFunctions.pqTrain(emb, "embedding", "vec_id", m = 8, k = 16, dim = 64)
    val codes = SimilarityFunctions.pqEncode(emb, "embedding", "vec_id", cb)
    val pq = SimilarityFunctions.pqRerankTopK(
      codes, emb, q, "vec_id", "embedding", k = 10, shortlist = 200, cb)
    val exact = SimilarityFunctions.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
    val rec = SimilarityFunctions.recallAtK(exact, pq).collect()
    assert(rec.length == 5)
    // measured 0.9-1.0 at sf0.001 with shortlist=200; gate leaves margin
    rec.foreach(r => assert(r.getDouble(1) >= 0.5, s"recall ${r.getDouble(1)}"))
    // re-ranked rows carry exact cosine, ranked desc per query
    val rows = pq.filter(col("query_id") === 0).orderBy(col("rank")).collect()
    assert(rows.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1)))
  }
}
