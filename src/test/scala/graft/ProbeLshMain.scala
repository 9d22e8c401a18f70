package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{DedupFunctions, TextFunctions}

/** Scratch probe: candidate-count ladder of the LSH pipeline at a given SF
  * dir — how many distinct band-colliding pairs vs estimate-surviving vs
  * exact-surviving. Drives the narrow-vs-wide join shape decision.
  */
object ProbeLshMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val numHashes = 64; val bands = 16; val rows = 4
    val sets = docs.select(col("doc_id").as("id"), split(col("text"), " ").as("tok"))
      .select(col("id"), array_distinct(TextFunctions.wordNGrams(col("tok"), 5)).as("shset"))
      .persist()
    val sh = sets.select(col("id"), explode(col("shset")).as("s"))
      .withColumn("h", pmod(hash(col("s")).cast("long"), lit(1L << 31)))
    val rnd = new scala.util.Random(42L)
    val params = Seq.fill(numHashes)((math.abs(rnd.nextLong()) % ((1L << 31) - 1) + 1, math.abs(rnd.nextLong()) % (1L << 31)))
    val sigs = sh.groupBy("id").agg(
      min(pmod(col("h") * params.head._1 + params.head._2, lit((1L << 31) - 1))).as("m0"),
      params.zipWithIndex.tail.map { case ((a, b), i) =>
        min(pmod(col("h") * a + b, lit((1L << 31) - 1))).as(s"m$i") }: _*)
    val withSig = sigs.withColumn("sig", array((0 until numHashes).map(i => col(s"m$i")): _*)).select("id", "sig").persist()
    val banded = withSig.select(col("id"),
      posexplode(array((0 until bands).map(bd => xxhash64(slice(col("sig"), bd * rows + 1, rows))): _*))
        .as(Seq("band", "bandHash")))
    val coll = banded.select(col("band"), col("bandHash"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bandHash"), col("id").as("id_b")).hint("merge"), Seq("band", "bandHash"))
      .filter(col("id_a") < col("id_b"))
    println(s"[probe] colliding band-pairs (non-distinct): ${coll.count()}")
    val pairs0 = coll.select("id_a", "id_b").distinct().persist()
    println(s"[probe] distinct colliding id pairs: ${pairs0.count()}")
    val est = pairs0.hint("shuffle_hash")
      .join(withSig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .hint("shuffle_hash")
      .join(withSig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est", aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, x) => acc + x).cast("double") / numHashes)
    println(s"[probe] est >= 0.65 pairs: ${est.filter(col("est") >= 0.65).count()}")
    spark.stop()
  }
}
