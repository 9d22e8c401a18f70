package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.MinHashSig

/** minhash_sig: the native one-pass signature must be NUMERICALLY IDENTICAL
  * to the explode + per-function min-aggregate lowering it replaced in
  * [[DedupFunctions.minHashNearDups]] (r18 optimization) — same seeded
  * parameter draw, same pmod arithmetic, same empty-set row semantics.
  */
class MinHashSigSpec extends SparkSuite {

  private val SigPrime   = (1L << 31) - 1
  private val ParamBound = 1L << 31

  /** The DedupFunctions.hashParams sequence, restated definitionally: the
    * expression's own draw must match the engine's historical one or every
    * committed minhash result would silently shift.
    */
  private def refParams(n: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((math.abs(rnd.nextLong()) % (ParamBound - 1) + 1,
      math.abs(rnd.nextLong()) % ParamBound))
  }

  test("parameter draw matches the historical hashParams sequence") {
    val (a, b) = MinHashSig.params(64, 42L)
    val ref    = refParams(64, 42L)
    assert(a.toSeq == ref.map(_._1) && b.toSeq == ref.map(_._2))
  }

  test("compute equals the explode + min-aggregate lowering (incl. pmod of negatives)") {
    val rnd    = new scala.util.Random(7)
    val grams  = Array.fill(200)(rnd.nextLong()) // raw xxhash64-like, signed
    val (a, b) = MinHashSig.params(16, 42L)
    val native = MinHashSig.compute(grams, a, b).toSeq
    val ref = (0 until 16).map { i =>
      grams.map { g =>
        val base = ((g % ParamBound) + ParamBound) % ParamBound // SQL pmod
        (base * a(i) + b(i)) % SigPrime
      }.min
    }
    assert(native == ref)
  }

  test("empty gram set yields NULL (the aggregate form emitted no row)") {
    val df = spark.range(2).select(
      col("id"),
      MinHashSig.minHashSig(
        when(col("id") === 0, array().cast("array<long>"))
          .otherwise(array(lit(5L), lit(-9L))), 8, 42L).as("sig"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[Long](1).size == 8)
  }

  test("DataFrame evaluation (codegen path) matches compute (interpreted path)") {
    val grams  = Seq(3L, 123456789L, -42L, Long.MaxValue, Long.MinValue + 1)
    val (a, b) = MinHashSig.params(64, 42L)
    val viaDf = spark.range(1)
      .select(MinHashSig.minHashSig(array(grams.map(lit): _*), 64, 42L))
      .head.getSeq[Long](0)
    assert(viaDf == MinHashSig.compute(grams.toArray, a, b).toSeq)
  }
}
