package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage decomposition for curate_dedup_keep_best (round-14 verdict
  * ask #3: local 1.29 → 2.51 s across r13→r14 with ScaleBench showing only
  * +11%). Hypothesis under test: the move is the r14 in-plan bound change to
  * the SHARED `ngramJaccardPairs` stage — the same accepted trade already
  * adjudicated for dedup_ngram_jaccard (7.93 → 11.8 s), visible across all
  * three consumers (ngram_jaccard, clusters, keep_best) proportionally to
  * the edge-building share of their runtime. This main times the stages
  * separately (3 warm reps each, min): edge derivation alone, connected
  * components over those edges, and the full query.
  */
object KeepBestProfile {
  def main(args: Array[String]): Unit = {
    val dir  = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def best(name: String)(f: => Long): Double = {
      f // warm
      val samples = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f
        graft.Bench.releaseAll(spark)
        (System.nanoTime() - t0) / 1e9
      }
      val m = samples.min
      println(f"[keepbest] $name%-18s min ${m}%.3f s  (reps ${samples.map(s => f"$s%.2f").mkString(", ")})")
      m
    }

    val bound = 300L
    val docs = spark.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") < bound)
    docs.cache().count()

    // the same core Surface.ngramJaccardPairs delegates to
    def pairs() = graft.functions.DedupFunctions
      .exactJaccardPairsChar(docs, "doc_id", "text", k = 10, 0.4)

    val edgesT = best("edges (shared)")(pairs().count())
    val ccT = best("edges+components") {
      val edges = pairs().select(col("id_a"), col("id_b"))
      graft.functions.DedupFunctions
        .connectedComponents(docs.select(col("doc_id").as("id")), edges).count()
    }
    val fullT = best("full query") {
      graft.SparkEntry.queries("curate_dedup_keep_best")(spark, dir).count()
    }
    println(f"[keepbest] edge share of full: ${100 * edgesT / fullT}%.0f%% " +
      f"(components add ${ccT - edgesT}%.3f s)")
    spark.stop()
  }
}
