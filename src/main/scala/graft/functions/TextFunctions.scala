package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built
  * entirely from codegen'd `org.apache.spark.sql.functions` column
  * expressions — no UDFs, so every operator stays inside whole-stage codegen
  * and scales linearly with executors (north-star extension per SURVEY §7.8).
  */
object TextFunctions {

  /** Whitespace token count (single-space tokenizer — matches the synthetic
    * corpus and is exactly reproducible in ANSI SQL for the oracle).
    */
  def tokenCount(text: Column): Column = size(split(text, " "))

  def distinctTokenCount(text: Column): Column = size(array_distinct(split(text, " ")))

  /** Shannon entropy (bits) of the TOKEN distribution: −Σ p log2 p over
    * distinct tokens — the information-density quality signal (low entropy
    * = boilerplate/repetition, bounded above by log2(n_tokens)). Takes a
    * PRE-MATERIALIZED token-array column (the wordNGrams rule: a split
    * inside the lambda would re-tokenize per element). Distinct tokens are
    * SORTED before the fold so the floating-point summation order is
    * deterministic and restatable engine-to-engine (array_distinct order
    * is first-occurrence in Spark but unspecified in DuckDB's
    * list_distinct). Pure per-row expressions: zero shuffle at any scale.
    */
  def tokenEntropy(tok: Column): Column = {
    val n = size(tok).cast("double")
    val terms = transform(array_sort(array_distinct(tok)), x => {
      val p = size(filter(tok, y => y === x)).cast("double") / n
      p * log2(p)
    })
    -aggregate(terms, lit(0.0), (acc, v) => acc + v)
  }

  /** Distinct-token ratio in [0,1]: low values flag boilerplate/repetition —
    * the standard cheap repetition-quality signal in pretraining curation.
    * Pure array expressions over one scan: zero shuffle at any corpus size.
    */
  def repetitionRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text).cast("double")

  /** Crude-PII patterns: email addresses and US-style phone numbers.
    * Deliberately simple, ANCHORED to token-ish boundaries, and stated
    * IDENTICALLY in the DuckDB oracles — a production scrubber would plug
    * richer patterns into the same two expressions.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Count of pattern hits in `text` — `regexp_extract_all` size, codegen'd. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** `text` with every pattern hit replaced by `mask`. */
  def piiScrub(text: Column, pattern: String, mask: String): Column =
    regexp_replace(text, pattern, mask)

  /** Occurrences of `needle` in `text` by replace-and-measure — chosen over
    * regexp so the DuckDB oracle can state the identical arithmetic.
    */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), "")))
      / needle.length).cast("int")

  /** Per-language stopword evidence for the n-gram/stopword language-ID
    * heuristic. Counts are over space-padded text so word boundaries hold.
    */
  val StopwordSets: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " a ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " y ", " los "),
    "fr" -> Seq(" le ", " et ", " les ")
  )

  def langHits(text: Column, lang: String): Column =
    StopwordSets(lang).map(w => occurrences(padded(text), w)).reduce(_ + _)

  private def padded(text: Column): Column = concat(lit(" "), text, lit(" "))

  /** Stopword-evidence language ID: arg-max of per-language hit counts with a
    * fixed tie-break order (en > de > es > fr), 'und' (undetermined) when no
    * evidence at all.
    */
  def langId(text: Column): Column = {
    val en = langHits(text, "en"); val de = langHits(text, "de")
    val es = langHits(text, "es"); val fr = langHits(text, "fr")
    when(en + de + es + fr === 0, lit("und"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Heuristic quality score in [0,1]: lexical diversity, sane token length,
    * stopword presence — the length/punct/stopword-ratio style signal used to
    * filter web corpora. Deterministic, closed-form, oracle-reproducible.
    */
  def qualityScore(text: Column): Column = {
    val nTok     = tokenCount(text).cast("double")
    val nDis     = distinctTokenCount(text).cast("double")
    val nChars   = length(text).cast("double")
    val diversity = nDis / nTok
    val avgTokLen = (nChars - (nTok - lit(1.0))) / nTok
    val lenOk     = when(avgTokLen >= 3 && avgTokLen <= 10, lit(1.0)).otherwise(lit(0.0))
    val stopRatio = least(langHits(text, "en").cast("double") / nTok * 10.0, lit(1.0))
    // NOT round(x, 6): Spark rounds the double's DECIMAL repr half-up while
    // DuckDB rounds the binary double, so an exact .xxxxx5 tie diverges by
    // 1 ulp of the 6th decimal (3 docs at sf0.1 landed on it). floor of the
    // same double arithmetic is bit-deterministic on both engines.
    floor((diversity * 0.5 + lenOk * 0.2 + stopRatio * 0.3) * 1e6 + 0.5) / 1e6
  }

  /** Canonical-form document fingerprint: md5 over lower-cased,
    * whitespace-collapsed, trimmed text — the cheap exact-dup key robust to
    * case/spacing noise.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Character k-shingles as an array column (the input to MinHash/Jaccard). */
  def shingles(text: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k)))

  /** Word n-grams over a PRE-MATERIALIZED token-array column (materialize
    * `split(text, " ")` into its own column first — referencing a split
    * expression inside the lambda would make Catalyst re-tokenize per
    * element). The standard document-dedup shingle (RefinedWeb/C4-style
    * minhash uses word 5-grams).
    *
    * A document with fewer than `n` tokens has ZERO n-grams — the guard
    * matters under Spark 4's default ANSI mode, where the unguarded
    * `element_at(tok, i + j)` past the array end is an error, not null.
    */
  def wordNGrams(tok: Column, n: Int): Column =
    when(size(tok) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(tok) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(tok, i + j)): _*)))

  /** A BPE-ish subword proxy: split on whitespace AND at letter/digit
    * boundaries, the standard pre-tokenization regex shape.
    */
  def subwordCount(text: Column): Column =
    size(split(text, "\\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"))

  /** Start offsets (0-based) of overlapping fixed-stride chunks covering
    * `text`: 0, stride, 2·stride, … < length — the training-data chunking
    * lattice (posexplode + substr turns it into one row per chunk; an empty
    * or null text yields an empty array, so the row vanishes on explode —
    * guarded explicitly because sequence(0, -1, +step) would throw).
    * Expression-only: the whole chunking pipeline stays in codegen with
    * zero shuffles.
    */
  def chunkStarts(text: Column, stride: Int): Column =
    when(length(text) > 0, sequence(lit(0), length(text) - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
}
