package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** Byte-pair-encoding subword tokenization trained ON the corpus — the
  * real tokenizer-construction step of an LLM data pipeline (Sennrich et
  * al. 2016, the public BPE algorithm), not a per-row regex count.
  *
  * Scale shape: training never touches the corpus again after ONE
  * combiner-friendly groupBy builds the word-frequency table — every
  * merge round runs on the VOCABULARY frame (sublinear in corpus size;
  * ~100k rows at 100 TB), one tiny aggregation + one bounded 1-row argmax
  * collect per round (the Lloyd/toscalar bounded-scalar precedent).
  * Encoding is then a broadcast join of corpus words against the trained
  * word→tokens map. Iterations localCheckpoint so the plan stays flat
  * (see trainVocab).
  *
  * Determinism: the merged pair each round is argmax by (count desc,
  * left asc, right asc) — ties break identically everywhere, so the
  * learned merge table is a pure function of the corpus.
  */
object BpeFunctions {

  /** Adjacent (left, right) token pairs of each vocabulary row. */
  private def adjacentPairs(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** One greedy left-to-right merge pass of (l, r) → l+r over a token
    * array: fold elements, gluing the current token onto the accumulator's
    * last when they spell the pair — "aaa" under (a,a) becomes [aa, a],
    * the reference BPE behavior. The last-element probe clamps its index to
    * ≥1 (index 0 is invalid even for try_element_at) and guards on size, so
    * the empty accumulator stays null-safe under ANSI.
    */
  private def mergePass(toks: Column, l: String, r: String): Column =
    aggregate(
      toks,
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 &&
          try_element_at(acc, greatest(size(acc), lit(1))) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train up to `nMerges` BPE merges on `docs`(text). Returns the trained
    * vocabulary frame `(w, f, toks)` and the learned merge rules in
    * application order.
    *
    * Each round ends in `localCheckpoint(eager = true)`: a plain persist
    * chain keeps the full logical lineage, and re-analyzing N rounds of
    * nested array-fold lambdas grows superlinearly (measured: 3 s at 8
    * rounds → 9 s at 12 → heap exhaustion at 20). Checkpointing truncates
    * the plan to the materialized rows, so every round plans against a
    * flat one-project frame — constant cost per merge.
    */
  def trainVocab(docs: DataFrame, nMerges: Int): (DataFrame, Seq[(String, String)]) = {
    require(nMerges >= 0, "BPE: nMerges must be non-negative") // 0 = character vocabulary
    val wf = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))

    var cur = wf
      .withColumn("toks", filter(split(col("w"), ""), x => x =!= ""))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var dry = false
    while (merges.size < nMerges && !dry) {
      val top = cur
        .select(col("f"), explode(adjacentPairs(col("toks"))).as("p"))
        .select(col("p.l").as("l"), col("p.r").as("r"), col("f"))
        .groupBy("l", "r").agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        val prev = cur
        cur = cur.withColumn("toks", mergePass(col("toks"), l, r))
          .localCheckpoint(true)
        // eager checkpoint materialized the new round — drop the old blocks
        graft.util.Checkpoints.release(prev)
      }
    }
    (cur, merges.toSeq)
  }

  /** Train and summarize in one row the oracle can re-derive: vocabulary/
    * char counts and the FIRST learned merge are exact cross-engine checks
    * (round 1 is computable in plain SQL), while the full-depth properties
    * only BPE itself can compute gate as in-plan booleans — every trained
    * word token-sequence concatenates back to its word (lossless
    * round-trip), and the encoded corpus is strictly shorter than its
    * character count (the merges actually compressed).
    */
  def bpeSummary(docs: DataFrame, nMerges: Int = 20): DataFrame = {
    val (vocab, merges) = trainVocab(docs, nMerges)
    require(merges.nonEmpty, "BPE: corpus has no adjacent pairs to merge")

    val baseChars = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(explode(filter(split(col("w"), ""), x => x =!= "")).as("c"))
      .agg(countDistinct(col("c")).as("base_chars"))

    val stats = vocab.agg(
      count(lit(1)).as("n_words"),
      sum(when(concat_ws("", col("toks")) === col("w"), lit(0L)).otherwise(lit(1L))).as("bad"),
      sum(col("f") * size(col("toks"))).as("tot_toks"),
      sum(col("f") * length(col("w"))).as("tot_chars"))

    stats.crossJoin(broadcast(baseChars))
      .select(
        col("n_words"),
        col("base_chars"),
        lit(merges.size).as("n_merges"),
        lit(merges.head._1 + merges.head._2).as("top_merge"),
        (col("bad") === 0L).as("ok_roundtrip"),
        (col("tot_toks") < col("tot_chars")).as("ok_compress"))
  }

  /** Encode the corpus with a trained vocabulary: the production shape —
    * train once on the word-frequency table, broadcast the word→tokens
    * map, ONE stateless pass over the documents. Returns (doc_id,
    * n_tokens).
    */
  def encodeTokenCounts(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(vocab.select(col("w"), size(col("toks")).as("nt"))), Seq("w"))
      .groupBy("doc_id").agg(sum(col("nt")).as("n_tokens"))
}
