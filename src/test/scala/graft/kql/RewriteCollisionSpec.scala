package graft.kql

import org.scalatest.funsuite.AnyFunSuite

/** Regression-proofs the rewrite() fixpoint trap (three round-10 instances,
  * e.g. `strrep -> repeat(`: the rename ran first, then the KQL `repeat`
  * expansion later in the same pass array-ified the Spark-intended call).
  *
  * KqlCompat.rewrite applies the NameRewrites map first, then a SEQUENCE of
  * expandCalls handlers; any text a rename or an earlier expansion emits is
  * re-scanned by every LATER handler. So a collision is:
  *   (a) a rename TARGET that some expandCalls handler also claims, or
  *   (b) an expansion emitting a call whose handler runs later in the pass,
  * and it is a BUG whenever the emitter meant the Spark semantics of that
  * name. Intent is not statically decidable, so this spec pins the scan's
  * findings to an exact reviewed allowlist: adding a new rename/emission
  * that collides fails here — at compile-of-the-rename time, not at oracle
  * time — and forces a conscious review; a removed entry fails too, keeping
  * the allowlist honest.
  *
  * The scan is textual over the KqlCompat source (the maps and handlers are
  * inline literals there — there is deliberately no runtime registry to
  * drift from).
  */
class RewriteCollisionSpec extends AnyFunSuite {

  private val src = {
    val f = scala.io.Source.fromFile(
      "src/main/scala/graft/functions/KqlCompat.scala", "UTF-8")
    try f.mkString finally f.close()
  }

  private val RenamePair  = """"([A-Za-z0-9_]+)\("\s*->\s*"([A-Za-z0-9_]+)\("""".r
  private val ExpandCall  = """expandCalls\([^,()]*,\s*"([A-Za-z0-9_]+)"\)""".r
  private val StringLit   = """"((?:[^"\\]|\\.)*)"""".r
  private val EmittedCall = """(?<![A-Za-z0-9_$.])([A-Za-z_][A-Za-z0-9_]*)\(""".r

  private val renamePairs = RenamePair.findAllMatchIn(src)
    .map(m => (m.group(1), m.group(2))).toSeq
  private val renameSources = renamePairs.map(_._1).toSet
  private val renameTargets = renamePairs.map(_._2).toSet
  // first handler position per name = its execution slot in the pass
  private val handlerPos: Map[String, Int] = ExpandCall.findAllMatchIn(src)
    .toSeq.groupBy(_.group(1)).view.mapValues(_.map(_.start).min).toMap

  test("scan preconditions: the maps are where this spec expects them") {
    assert(renamePairs.size >= 30, s"NameRewrites parse broke: ${renamePairs.size} pairs")
    assert(handlerPos.size >= 150, s"expandCalls parse broke: ${handlerPos.size} names")
  }

  test("rename targets claimed by an expandCalls handler are exactly the canonicalization chains") {
    // Reviewed-safe: these renames are alias -> canonical-KQL-name with the
    // SAME semantics, deliberately fed into the canonical name's expansion
    // (extract_json -> extractjson, pack_dictionary -> bag_pack,
    // make_string -> unicode_codepoints_to_string: the deprecated ADX
    // alias feeds the canonical codepoints expansion). A rename whose
    // target is meant as a SPARK function must never appear here — that
    // is the strrep->repeat corruption class.
    val intendedChains = Set("extractjson", "bag_pack", "unicode_codepoints_to_string")
    assert(renameTargets.intersect(handlerPos.keySet) == intendedChains,
      "rename-target/expandCalls collision set changed — review whether the " +
        "target is meant as Spark (corruption: make it an expandCalls case, " +
        "like strrep) or as canonical KQL (extend intendedChains)")
  }

  test("no rename target is another rename's source") {
    // NameRewrites applies sequentially: entry i's target colliding with
    // entry j's source (j > i) would double-rewrite. Currently none; keep
    // it that way rather than reasoning about order.
    assert(renameTargets.intersect(renameSources).isEmpty)
  }

  test("emissions re-scanned by a later handler are exactly the reviewed set") {
    // Every string-literal call token whose handler runs LATER in the pass
    // (so the emitted text WILL be re-expanded). Reviewed-safe today:
    //  - intended chains (the emitter wants the KQL expansion applied):
    //    toguid (base64 guid codecs), geo_* primitives composed into later
    //    geo predicates, series_outliers/series_decompose chain, parse_url
    //    inside parse_urlquery, format_ipv4 inside format_ipv4_mask,
    //    startofweek inside week_of_year-adjacent handlers, bag_pack.
    //  - arity-guarded: `split` (handler matches only the 3-arg KQL form;
    //    emitted 2-arg Spark split passes through), `trim` (2-arg handler,
    //    emitted 1-arg Spark trim untouched).
    // A NEW name here means an expansion now emits a call some later
    // handler claims — decide chain vs corruption before allowlisting.
    // Round-12 additions, each an intended chain: geo_angle emits
    // geo_azimuth (azimuth arithmetic composed through the later azimuth
    // expansion), erfc emits erf (the complement riding the later A-S
    // polynomial), bin_auto emits bin (the query_bin_auto_size binding
    // fed into the later bin flooring).
    // "dynamic" is NOT an emission: rewriteDynamicBags scans for the
    // literal token "dynamic(" (its own input detection, runs BEFORE the
    // array handler and leaves non-bag calls untouched).
    val reviewed = Set(
      "bag_pack", "bin", "dynamic", "erf", "format_ipv4", "geo_azimuth",
      "geo_distance_2points", "geo_distance_point_to_line",
      "geo_intersects_2lines", "geo_line_length", "geo_point_in_polygon",
      "parse_url", "series_decompose", "series_outliers", "split",
      "startofweek", "toguid", "trim")

    // exclude the literals that ARE the maps (rename pairs, handler args)
    val excluded =
      RenamePair.findAllMatchIn(src).map(m => (m.start, m.end)).toSeq ++
      ExpandCall.findAllMatchIn(src).map(m => (m.start, m.end)).toSeq
    def isExcluded(p: Int) = excluded.exists { case (a, b) => p >= a && p < b }

    val emittedLater = (for {
      lit  <- StringLit.findAllMatchIn(src) if !isExcluded(lit.start)
      call <- EmittedCall.findAllMatchIn(lit.group(1))
      name  = call.group(1)
      hp   <- handlerPos.get(name) if hp > lit.start
    } yield name).toSet

    assert(emittedLater == reviewed,
      s"later-handler emission set changed — added: ${emittedLater.diff(reviewed)}, " +
        s"removed: ${reviewed.diff(emittedLater)}")
  }
}
