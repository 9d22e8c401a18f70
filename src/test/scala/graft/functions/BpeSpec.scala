package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BPE trainer: hand-checkable merges on a tiny corpus, the greedy
  * left-to-right merge-pass semantics, round-trip and encode contracts.
  */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  test("learns the hand-computed merges of a tiny corpus in order") {
    // corpus: "low" x5, "lower" x2  (the classic Sennrich-style example)
    // round 1 pair counts: lo=7, ow=7, we=2, er=2 → tie (lo, ow) breaks
    // lexicographically: merge1 = (l,o) → lo
    // round 2: (lo,w)=7 beats (w,e)=2,(e,r)=2 → merge2 = lo+w
    // round 3: low,e=2 e,r=2 → (e,r) vs (low,e): tie at 2 → "e" < "low"
    // so merge3 = (e,r) → er
    val docs = Seq((1L, ("low " * 5 + "lower " * 2).trim)).toDF("doc_id", "text")
    val (vocab, merges) = BpeFunctions.trainVocab(docs, 3)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    val toks = vocab.select(col("w"), col("toks")).as[(String, Seq[String])]
      .collect().toMap
    assert(toks("low") == Seq("low"))
    assert(toks("lower") == Seq("low", "er"))

  }

  test("merge pass is greedy left-to-right: aaa + (a,a) -> [aa, a]") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val (vocab, merges) = BpeFunctions.trainVocab(docs, 1)
    assert(merges == Seq(("a", "a")))
    val toks = vocab.select(col("toks")).as[Seq[String]].head()
    assert(toks == Seq("aa", "a"))

  }

  test("summary row: round-trip holds, compresses, top merge matches") {
    val docs = Seq(
      (1L, "spark spark sparkle"), (2L, "spark row row"), (3L, "parka"))
      .toDF("doc_id", "text")
    val row = BpeFunctions.bpeSummary(docs, 4).head()
    assert(row.getAs[Long]("n_words") == 4)      // spark sparkle row parka
    assert(row.getAs[Int]("n_merges") == 4)
    assert(row.getAs[Boolean]("ok_roundtrip"))
    assert(row.getAs[Boolean]("ok_compress"))
    // round-1 pairs weighted by word occurrences: "ar" appears in
    // spark(3) sparkle(1) parka(1) = 5, "sp"=4, "pa"=5... verify argmax by
    // recomputing naively
    val words = Seq("spark" -> 3L, "sparkle" -> 1L, "row" -> 2L, "parka" -> 1L)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { case (w, f) =>
      w.sliding(2).foreach(p =>
        counts((p.substring(0, 1), p.substring(1))) =
          counts.getOrElse((p.substring(0, 1), p.substring(1)), 0L) + f)
    }
    val best = counts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.head._1
    assert(row.getAs[String]("top_merge") == best._1 + best._2)
  }

  test("encodeTokenCounts: broadcast-dictionary encode sums word tokens") {
    val docs = Seq((1L, "ab ab"), (2L, "abc")).toDF("doc_id", "text")
    val (vocab, _) = BpeFunctions.trainVocab(docs, 1) // merges (a,b) -> ab
    val enc = BpeFunctions.encodeTokenCounts(docs, vocab)
      .orderBy("doc_id").as[(Long, Long)].collect()
    // doc1: "ab"=1 token x2 = 2; doc2: "abc" -> [ab, c] = 2
    assert(enc.toSeq == Seq((1L, 2L), (2L, 2L)))

  }
}
