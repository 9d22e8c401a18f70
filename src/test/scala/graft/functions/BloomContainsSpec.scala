package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSuite
import graft.functions.expressions.BloomContains

/** `bloom_contains` contract: zero false negatives (the property the
  * decontamination prefilter's correctness rests on), bounded false
  * positives, null propagation, and parity between codegen and interpreted
  * paths.
  */
class BloomContainsSpec extends SparkSuite {

  import spark.implicits._

  private def bloomOf(vs: Seq[Long], expect: Long = 1000L): Array[Byte] = {
    val bf = BloomFilter.create(expect, 0.01)
    vs.foreach(bf.putLong)
    BloomContains.serialize(bf)
  }

  test("no false negatives; FPR stays near the configured 1%") {
    val member = (0L until 1000L).map(_ * 7919L)
    val bytes  = bloomOf(member)
    val df = spark.range(0, 20000).select((col("id") * 7919L).as("v"))
    val hits = df.filter(BloomContains.bloomContains(lit(bytes), col("v"))).count()
    assert(hits >= 1000L, "bloom dropped a member — false negative")
    assert(hits <= 1000L + 600L, s"FPR far above 1%: ${hits - 1000} extra of 19000")
  }

  test("null value yields null; null bloom yields null") {
    val bytes = bloomOf(Seq(1L, 2L))
    val df = Seq(Some(1L), None).toDF("v")
    val out = df.select(BloomContains.bloomContains(lit(bytes), col("v")).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else java.lang.Boolean.valueOf(r.getBoolean(0)))
    assert(out.toSeq == Seq(java.lang.Boolean.TRUE, null))
    val nullBloom = Seq(1L).toDF("v")
      .select(BloomContains.bloomContains(lit(null).cast("binary"), col("v")).as("m"))
      .collect()
    assert(nullBloom.head.isNullAt(0))
  }

  test("interpreted path (filter on non-codegen eval) agrees with codegen") {
    val bytes = bloomOf(Seq(10L, 20L, 30L))
    // force interpreted evaluation through the expression's eval
    val e = BloomContains(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        bytes, org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        20L, org.apache.spark.sql.types.LongType))
    assert(e.eval(null) == true)
    val miss = BloomContains(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        bytes, org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        21L, org.apache.spark.sql.types.LongType))
    // 21 was never inserted; with 3 items in a 1000-capacity bloom a false
    // positive here is astronomically unlikely
    assert(miss.eval(null) == false)
  }

  test("non-foldable bloom argument is rejected at analysis") {
    val df = Seq((Array[Byte](1, 2), 1L)).toDF("b", "v")
    val ex = intercept[Exception] {
      df.select(BloomContains.bloomContains(col("b"), col("v"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("foldable"))
  }
}
