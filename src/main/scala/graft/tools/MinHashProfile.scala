package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the minhash pipeline stages (not part of the
  * surface; used to attribute bench time).
  */
object MinHashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    import graft.functions.{DedupFunctions, TextFunctions}
    import org.apache.spark.sql.functions._

    // stage 1: shingle + signature
    val full = DedupFunctions.minHashNearDups(docs, "doc_id", "text",
      numHashes = 64, bands = 8, threshold = 0.8, wordGrams = 5)
    time("full pipeline")(println("pairs: " + full.count()))
    time("full pipeline (2nd run)")(println("pairs: " + full.count()))

    // raw shingle volume
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.wordNGrams(split(col("text"), " "), 5))).as("s"))
    time("shingle explode count")(println("shingle rows: " + sh.count()))

    // simhash stages
    val hashed = DedupFunctions.simHash(docs, "doc_id", "text")
    time("simHash signatures")(println("sigs: " + hashed.count()))
    time("simHash signatures (2nd)")(println("sigs: " + hashed.count()))
    val ndp = DedupFunctions.simHashNearDups(docs, "doc_id", "text", maxHamming = 16)
    time("simHashNearDups mh=16")(println("simhash pairs mh=16: " + ndp.count()))
    for (mh <- Seq(3, 6)) {
      val d = DedupFunctions.simHashNearDups(docs, "doc_id", "text", maxHamming = mh)
      time(s"simHashNearDups mh=$mh")(println(s"simhash pairs mh=$mh: " + d.count()))
    }

    import graft.functions.SimilarityFunctions
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    val nd = SimilarityFunctions.cosineNearDups(emb, "vec_id", "embedding",
      threshold = 0.45, nPlanes = 4, nTables = 6)
    time("cosineNearDups")(println("neardup pairs: " + nd.count()))
    time("cosineNearDups (2nd run)")(println("neardup pairs: " + nd.count()))
    spark.stop()
  }
}
