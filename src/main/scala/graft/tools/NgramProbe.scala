package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage probe for the dedup_ngram_jaccard plan (r13): times the
  * gram derivation, the posting groupBy, and the pair expansion
  * separately at the sf0.1 slice so a regression names its stage.
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir  = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val bound = t("count")(docs.count() * 3 / 5)
    val sliced = docs.filter(col("doc_id") < bound)
    val grams = sliced.select(col("doc_id").as("id"),
        array_distinct(graft.functions.TextFunctions.shingles(col("text"), 10)).as("_set"))
      .select(col("id"), size(col("_set")).as("n"), explode(col("_set")).as("g"))
    t("grams-materialize")(grams.count())
    val posts = grams
      .select(xxhash64(col("g")).as("g"), struct(col("id"), col("n")).as("m"))
      .groupBy("g").agg(collect_list(col("m")).as("ms"))
    t("posts-count")(posts.count())
    val shared = posts.filter(size(col("ms")) > 1)
    t("shared-count")(println("shared grams: " + shared.count()))
    val ms = array_sort(col("ms"))
    val combos = flatten(transform(ms, (a, i) =>
      transform(slice(ms, i + lit(2), size(col("ms"))), b =>
        struct(a.getField("id").as("id_a"), a.getField("n").as("na"),
               b.getField("id").as("id_b"), b.getField("n").as("nb")))))
    val pairs = shared.select(explode(combos).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("i"), min(col("p.na")).as("na"), min(col("p.nb")).as("nb"))
    t("pairs-full")(println("pair rows: " + pairs.count()))
    t("e2e-again")(
      graft.functions.DedupFunctions.exactJaccardPairsChar(sliced, "doc_id", "text", 10, 0.4).count())
    spark.stop()
  }
}
