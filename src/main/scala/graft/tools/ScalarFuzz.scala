package graft.tools

import java.time.Instant
import java.time.temporal.ChronoUnit

/** Core of the KQL scalar differential fuzz (round-13 verdict ask #4,
  * round-14 verdict ask #5): a seeded generator of random TYPED compositions
  * over the scalar surface, an independent evaluator implementing the
  * ADX-documented semantics directly, and TWO renderers — KQL text (fed to
  * `KqlCompat.rewrite` → Spark by the spec) and a DuckDB-SQL twin derived
  * from the SAME AST for every composition whose operators DuckDB can
  * express. The twin gives the fuzz a second referee that shares no code or
  * authorship blind spots with either the rewriter or the evaluator:
  * `graft.tools.FuzzDump` dumps (kql, duck_sql, expected) and
  * `scripts/check_fuzz.py` executes the twins in DuckDB and diffs against
  * the evaluator, completing the three-way Spark/evaluator/DuckDB diff.
  *
  * Lives in src/main (not the spec) so the ScalaTest lane and the DuckDB
  * dump lane generate the IDENTICAL case list from the same seed.
  *
  * Scope notes (inherited from the r14 spec): double-valued functions are
  * domain-guarded and compared with relative tolerance; string literal
  * leaves avoid quotes/backslashes; regex-taking functions and functions
  * with documented-arbitrary ordering are out. The dynamic BAG family
  * (bag_pack/bag_merge/bag_set_key/bag_remove_keys/bag_keys/bag_has_key/
  * extractjson — JSON-string currency) twins through DuckDB's native JSON
  * type since round 17 (r16 verdict #4): json_object preserves bag_pack's
  * insertion order; the check_fuzz-defined bag_sort/bag_remove macros
  * reproduce the sorted-key contracts of merge/set/remove; bag results
  * compare as ordered (key, value) pairs. The only remaining skips are
  * structural: a datetime_add/diff whose unit argument is not a literal.
  */
object ScalarFuzz {

  // ---- value model ---------------------------------------------------------
  sealed trait V
  case class VStr(s: String)                 extends V
  case class VInt(l: Long)                   extends V
  case class VDbl(d: Double)                 extends V
  case class VBool(b: Boolean)               extends V
  case class VDt(i: Instant)                 extends V
  case class VArr(vs: Vector[V])             extends V
  case class VBag(kv: Vector[(String, V)])   extends V
  case object VNull                          extends V

  sealed trait Ty
  case object TStr  extends Ty
  case object TInt  extends Ty
  case object TDbl  extends Ty // double-valued math family (tolerant compare)
  case object TBool extends Ty
  case object TDt   extends Ty
  case object TArrS extends Ty // array<string>
  case object TArrI extends Ty // array<long>
  case object TBag  extends Ty // JSON-string property bag

  // ---- AST -----------------------------------------------------------------
  sealed trait Node { def ty: Ty }
  case class Lit(v: V, ty: Ty) extends Node
  case class Call(name: String, args: Vector[Node], ty: Ty) extends Node

  // ---- rendering to KQL ----------------------------------------------------
  private def renderLit(v: V): String = v match {
    case VStr(s)  => s"'$s'" // leaf pool is quote/backslash-free by construction
    case VInt(l)  => l.toString
    case VDbl(d)  => if (d == d.toLong.toDouble) s"${d.toLong}.0" else d.toString
    case VBool(b) => b.toString
    case VDt(i)   =>
      val t = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
      f"datetime(${t.getYear}%04d-${t.getMonthValue}%02d-${t.getDayOfMonth}%02d " +
        f"${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d)"
    case other => sys.error(s"unrenderable literal: $other")
  }

  def render(n: Node): String = n match {
    case Lit(v, _) => renderLit(v)
    case Call(op, a, _) => op match {
      case "d+" | "d-" | "d*"                            => s"(${render(a(0))} ${op.drop(1)} ${render(a(1))})"
      case "+" | "-" | "*"                               => s"(${render(a(0))} ${op} ${render(a(1))})"
      case "==" | "!=" | "<" | "<=" | ">" | ">="         => s"(${render(a(0))} ${op} ${render(a(1))})"
      case "and" | "or"                                  => s"(${render(a(0))} ${op} ${render(a(1))})"
      case "round_d"                                     => s"round(${a.map(render).mkString(", ")})"
      case f                                             => s"$f(${a.map(render).mkString(", ")})"
    }
  }

  // ---- rendering to DuckDB SQL (the second referee) -------------------------
  // Derived from the AST directly — NOT from KqlCompat's output — so the twin
  // shares nothing with the rewriter. Returns None when the composition uses
  // an operator with no faithful DuckDB twin (the bag family).
  private def duckLit(v: V): String = v match {
    case VStr(s)  => s"'$s'"
    case VInt(l)  => s"CAST($l AS BIGINT)"
    case VDbl(d)  => s"CAST($d AS DOUBLE)"
    case VBool(b) => b.toString.toUpperCase
    case VDt(i)   => s"TIMESTAMP '${i.toString.stripSuffix("Z").replace('T', ' ')}'"
    case other    => sys.error(s"unduckable literal: $other")
  }

  /** Left = the ops that make the composition untwinnable (accumulated over
    * the WHOLE tree); Right = the DuckDB SQL. One function is the single
    * source of both the twin and the skip census, so [[renderDuck]] and
    * [[unduckableOps]] can never desync (round-16 advice #3).
    */
  private def duck(n: Node): Either[Vector[String], String] = n match {
    case Lit(v, _) => Right(duckLit(v))
    case Call(op, a, _) =>
      val subs     = a.map(duck)
      val subSkips = subs.flatMap(_.left.toOption).flatten.toVector
      // structural refusals only (a datetime unit the renderer can only
      // emit for a literal). The bag family twins through DuckDB's native
      // JSON type since round 17 (r16 verdict #4): bags render as JSON
      // text — `json_object` preserves bag_pack's insertion order, and the
      // `bag_sort`/`bag_remove` macros check_fuzz defines reproduce the
      // engine's sorted-key contracts for merge/set/remove — so key-order-
      // dependent downstream compositions (strcat_array over bag_keys)
      // compare exactly, not just set-wise.
      val hereSkip: Vector[String] =
        if ((op == "datetime_add" || op == "datetime_diff") &&
          !a.headOption.exists { case Lit(VStr(_), _) => true; case _ => false })
          Vector(s"$op(non-literal-unit)")
        else Vector.empty
      if (subSkips.nonEmpty || hereSkip.nonEmpty) Left((subSkips ++ hereSkip).distinct)
      else {
        val x = subs.map(_.toOption.get)
        Right(op match {
          case "d+" | "d-" | "d*" => s"(${x(0)} ${op.drop(1)} ${x(1)})"
          case "+" | "-" | "*"    => s"(${x(0)} $op ${x(1)})"
          case "==" => s"(${x(0)} = ${x(1)})"
          case "!=" => s"(${x(0)} <> ${x(1)})"
          case "<" | "<=" | ">" | ">=" => s"(${x(0)} $op ${x(1)})"
          case "and" => s"(${x(0)} AND ${x(1)})"
          case "or"  => s"(${x(0)} OR ${x(1)})"
          case "not" => s"(NOT ${x(0)})"
          case "iif" => s"(CASE WHEN ${x(0)} THEN ${x(1)} ELSE ${x(2)} END)"
          // strings
          case "toupper" => s"upper(${x(0)})"
          case "tolower" => s"lower(${x(0)})"
          case "reverse" => s"reverse(${x(0)})"
          case "strcat"  => x.mkString("(", " || ", ")")
          case "substring" =>
            // ADX zero-based start → DuckDB 1-based substr; DuckDB clamps
            // out-of-range the same way for start ≥ 1 and len ≥ 0
            if (a.size < 3) s"substr(${x(0)}, GREATEST(${x(1)}, 0) + 1)"
            else s"substr(${x(0)}, GREATEST(${x(1)}, 0) + 1, GREATEST(${x(2)}, 0))"
          case "replace_string" => s"replace(${x(0)}, ${x(1)}, ${x(2)})"
          case "translate"      =>
            // ADX translate(search, replace, text) → pg-style translate(text, from, to)
            s"translate(${x(2)}, ${x(0)}, ${x(1)})"
          case "strlen"  => s"CAST(length(${x(0)}) AS BIGINT)"
          case "countof" => // OVERLAPPING plain-text count (the ADX default):
            // every start offset where the needle matches, via a positional
            // scan — NOT the replace() trick, which misses self-overlaps.
            // Empty-needle guard mirrors KqlCompat's plainCountof (0, not
            // len+1 vacuous matches) — the generator pool is never empty
            // today, but a future pool change must not desync three lanes.
            s"CAST(CASE WHEN length(${x(1)}) = 0 THEN 0 ELSE " +
              s"len(list_filter(range(1, greatest(length(${x(0)}) - length(${x(1)}) + 2, 1)), " +
              s"__i -> substring(${x(0)}, __i, length(${x(1)})) = ${x(1)})) END AS BIGINT)"
          case "tostring" => s"CAST(${x(0)} AS VARCHAR)"
          case "indexof" => s"CAST(strpos(${x(0)}, ${x(1)}) - 1 AS BIGINT)"
          case "strcat_array" => s"array_to_string(${x(0)}, ${x(1)})"
          case "strrep"  => s"repeat(${x(0)}, CAST(${x(1)} AS INTEGER))"
          // integers
          case "abs"    => s"abs(${x(0)})"
          case "min_of" => s"least(${x(0)}, ${x(1)})"
          case "max_of" => s"greatest(${x(0)}, ${x(1)})"
          case "bin"    =>
            // floor alignment, negative-safe (values are small; the double
            // round-trip is exact far beyond the generator's ranges)
            s"(CAST(floor(CAST(${x(0)} AS DOUBLE) / ${x(1)}) AS BIGINT) * ${x(1)})"
          case "toint" | "tolong" => x(0)
          // doubles
          case "exp"      => s"exp(${x(0)})"
          case "log"      => s"ln(${x(0)})"
          case "log10"    => s"log10(${x(0)})"
          case "sqrt"     => s"sqrt(${x(0)})"
          case "sin"      => s"sin(${x(0)})"
          case "cos"      => s"cos(${x(0)})"
          case "pow"      => s"pow(${x(0)}, ${x(1)})"
          case "todouble" => s"CAST(${x(0)} AS DOUBLE)"
          case "round_d"  => s"round(${x(0)}, CAST(${x(1)} AS INTEGER))"
          // booleans
          case "isempty"    => s"(${x(0)} = '')"
          case "isnotempty" => s"(${x(0)} <> '')"
          // datetimes (unit literality pre-checked in hereSkip above)
          case "datetime_add" =>
            val unit = a(0).asInstanceOf[Lit].v.asInstanceOf[VStr].s
            s"(${x(2)} + (${x(1)} * INTERVAL 1 ${unit.toUpperCase}))"
          case "datetime_diff" =>
            val unit = a(0).asInstanceOf[Lit].v.asInstanceOf[VStr].s
            // DuckDB date_diff counts partition-boundary crossings — the
            // ADX contract (the r14 datetime_diff fix, independently stated)
            s"date_diff('$unit', ${x(2)}, ${x(1)})"
          // DuckDB date_trunc('day', ts) narrows to DATE — cast back
          case "startofday"   => s"CAST(date_trunc('day', ${x(0)}) AS TIMESTAMP)"
          case "startofmonth" => s"CAST(date_trunc('month', ${x(0)}) AS TIMESTAMP)"
          case "startofyear"  => s"CAST(date_trunc('year', ${x(0)}) AS TIMESTAMP)"
          case "dayofyear"    => s"CAST(EXTRACT(doy FROM ${x(0)}) AS BIGINT)"
          case "getyear"    => s"CAST(EXTRACT(year FROM ${x(0)}) AS BIGINT)"
          case "getmonth"   => s"CAST(EXTRACT(month FROM ${x(0)}) AS BIGINT)"
          case "dayofmonth" => s"CAST(EXTRACT(day FROM ${x(0)}) AS BIGINT)"
          case "hourofday"  => s"CAST(EXTRACT(hour FROM ${x(0)}) AS BIGINT)"
          // arrays
          case "pack_array"    => x.mkString("[", ", ", "]")
          case "array_length"  => s"CAST(len(${x(0)}) AS BIGINT)"
          case "array_concat"  => s"list_concat(${x(0)}, ${x(1)})"
          case "array_reverse" => s"list_reverse(${x(0)})"
          case "array_index_of" =>
            s"CAST(COALESCE(list_position(${x(0)}, ${x(1)}), 0) - 1 AS BIGINT)"
          case "split" => s"string_split(${x(0)}, ${x(1)})"
          // bags — JSON-text currency on the DuckDB side too. Key order is
          // part of the engine contract and is reproduced exactly:
          // insertion order from json_object, sorted keys from the
          // bag_sort/bag_remove macros (defined by check_fuzz.py).
          case "bag_pack" => s"json_object(${x.mkString(", ")})"
          case "bag_merge" => // earlier argument wins -> patch the LATER with the EARLIER
            s"bag_sort(json_merge_patch(${x(1)}, ${x(0)}))"
          case "bag_set_key" => // new pair overwrites; output keys sorted
            s"bag_sort(json_merge_patch(${x(0)}, json_object(${x(1)}, ${x(2)})))"
          case "bag_remove_keys" => s"bag_remove(${x(0)}, ${x(1)})"
          case "bag_keys"        => s"json_keys(${x(0)})"
          case "bag_has_key"     => s"list_contains(json_keys(${x(0)}), ${x(1)})"
          case "extractjson"     => // args are (path, bag); absent key -> NULL
            s"json_extract_string(${x(1)}, ${x(0)})"
          case other => sys.error(s"duck renderer hole: $other")
        })
      }
  }

  /** The DuckDB twin, when every op in the composition is portable. */
  def renderDuck(n: Node): Option[String] = duck(n).toOption

  // ---- the independent evaluator (ADX-documented semantics) ----------------
  private def str(v: V): String    = v.asInstanceOf[VStr].s
  private def int(v: V): Long      = v.asInstanceOf[VInt].l
  private def bool(v: V): Boolean  = v.asInstanceOf[VBool].b
  private def dt(v: V): Instant    = v.asInstanceOf[VDt].i
  private def arr(v: V): Vector[V] = v.asInstanceOf[VArr].vs
  private def bag(v: V): Vector[(String, V)] = v.asInstanceOf[VBag].kv
  private def dbl(v: V): Double = v match {
    case VDbl(d) => d
    case VInt(l) => l.toDouble
    case other   => sys.error(s"dbl type hole: $other")
  }

  private def chrono(part: String): ChronoUnit = part match {
    case "day" => ChronoUnit.DAYS; case "hour" => ChronoUnit.HOURS
    case "minute" => ChronoUnit.MINUTES; case "second" => ChronoUnit.SECONDS
  }

  def eval(n: Node): V = n match {
    case Lit(v, _) => v
    case Call(op, a, _) =>
      val x = a.map(eval)
      op match {
        // strings
        case "toupper" => VStr(str(x(0)).toUpperCase)
        case "tolower" => VStr(str(x(0)).toLowerCase)
        case "reverse" => VStr(str(x(0)).reverse)
        case "strcat"  => VStr(x.map(str).mkString) // nulls never generated
        case "substring" =>
          // ADX: zero-based start; out-of-range clamps to empty; optional len
          val s = str(x(0)); val st = int(x(1)).toInt
          val from = math.max(0, math.min(st, s.length))
          val to = if (x.size < 3) s.length
                   else math.max(from, math.min(from + math.max(0, int(x(2)).toInt), s.length))
          VStr(s.substring(from, to))
        case "replace_string" => VStr(str(x(0)).replace(str(x(1)), str(x(2))))
        case "translate" =>
          // ADX translate(searchList, replacementList, text): per-char map
          // (generator keeps |search| == |replace|, the well-specified core)
          val m = str(x(0)).zip(str(x(1))).toMap
          VStr(str(x(2)).map(c => m.getOrElse(c, c)))
        case "strlen"  => VInt(str(x(0)).length.toLong)
        case "countof" =>
          // ADX 'normal' kind: plain-text matches MAY OVERLAP — count every
          // start offset (countof('aaa','aa') = 2), stepping by 1 not by
          // the needle length (round-16 review finding #2)
          val s0 = str(x(0)); val t = str(x(1))
          var c = 0L; var i = if (t.isEmpty) -1 else s0.indexOf(t)
          while (i >= 0) { c += 1; i = s0.indexOf(t, i + 1) }
          VInt(c)
        case "tostring" => VStr(int(x(0)).toString)
        case "indexof" => VInt(str(x(0)).indexOf(str(x(1))).toLong) // 0-based, -1 absent
        case "strcat_array" => VStr(arr(x(0)).map(str).mkString(str(x(1))))
        case "strrep" => VStr(str(x(0)) * int(x(1)).toInt) // generator keeps 0..4
        // integers
        case "+" => VInt(int(x(0)) + int(x(1)))
        case "-" => VInt(int(x(0)) - int(x(1)))
        case "*" => VInt(int(x(0)) * int(x(1)))
        case "abs"    => VInt(math.abs(int(x(0))))
        case "min_of" => VInt(math.min(int(x(0)), int(x(1))))
        case "max_of" => VInt(math.max(int(x(0)), int(x(1))))
        case "bin"    => // floor alignment, negative-safe: bin(-7, 3) = -9
          val v = int(x(0)); val w = int(x(1))
          VInt(math.floorDiv(v, w) * w)
        case "toint" | "tolong" => x(0)
        case "iif" => if (bool(x(0))) x(1) else x(2)
        // doubles (same-JVM Math semantics; compared with relative tolerance)
        case "d+"      => VDbl(dbl(x(0)) + dbl(x(1)))
        case "d-"      => VDbl(dbl(x(0)) - dbl(x(1)))
        case "d*"      => VDbl(dbl(x(0)) * dbl(x(1)))
        case "exp"     => VDbl(math.exp(dbl(x(0))))
        case "log"     => VDbl(math.log(dbl(x(0))))   // generator guards arg > 0
        case "log10"   => VDbl(math.log10(dbl(x(0))))
        case "sqrt"    => VDbl(math.sqrt(dbl(x(0))))  // generator guards arg >= 0
        case "sin"     => VDbl(math.sin(dbl(x(0))))
        case "cos"     => VDbl(math.cos(dbl(x(0))))
        case "pow"     => VDbl(math.pow(dbl(x(0)), dbl(x(1))))
        case "todouble" => VDbl(dbl(x(0)))
        case "round_d" => // ADX round(x, n): half-away-from-zero at n decimals
          val n = int(x(1)).toInt
          val f = math.pow(10, n)
          VDbl(math.round(dbl(x(0)) * f) / f) // args kept non-negative by the generator
        // booleans
        case "==" => VBool(x(0) == x(1))
        case "!=" => VBool(x(0) != x(1))
        case "<"  => cmp(x(0), x(1), _ < 0)
        case "<=" => cmp(x(0), x(1), _ <= 0)
        case ">"  => cmp(x(0), x(1), _ > 0)
        case ">=" => cmp(x(0), x(1), _ >= 0)
        case "and" => VBool(bool(x(0)) && bool(x(1)))
        case "or"  => VBool(bool(x(0)) || bool(x(1)))
        case "not" => VBool(!bool(x(0)))
        case "isempty"    => VBool(str(x(0)).isEmpty)
        case "isnotempty" => VBool(str(x(0)).nonEmpty)
        // datetimes
        case "datetime_add" =>
          // week is exactly 7 days in ADX and DuckDB alike; ChronoUnit.WEEKS
          // is "estimated" so Instant.plus rejects it — expand by hand
          if (str(x(0)) == "week") VDt(dt(x(2)).plus(int(x(1)) * 7, ChronoUnit.DAYS))
          else VDt(dt(x(2)).plus(int(x(1)), chrono(str(x(0)))))
        case "datetime_diff" =>
          // ADX: count of period BOUNDARIES crossed between 2nd and 1st arg
          val u = chrono(str(x(0)))
          val t1 = dt(x(1)).truncatedTo(u); val t2 = dt(x(2)).truncatedTo(u)
          VInt(u.between(t2, t1))
        case "startofday" => VDt(dt(x(0)).truncatedTo(ChronoUnit.DAYS))
        case "startofmonth" =>
          val d = java.time.LocalDateTime.ofInstant(dt(x(0)), java.time.ZoneOffset.UTC)
          VDt(d.toLocalDate.withDayOfMonth(1).atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
        case "startofyear" =>
          val d = java.time.LocalDateTime.ofInstant(dt(x(0)), java.time.ZoneOffset.UTC)
          VDt(d.toLocalDate.withDayOfYear(1).atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
        case "dayofyear" =>
          VInt(java.time.LocalDateTime.ofInstant(dt(x(0)), java.time.ZoneOffset.UTC).getDayOfYear.toLong)
        case "getyear" =>
          VInt(java.time.LocalDateTime.ofInstant(dt(x(0)), java.time.ZoneOffset.UTC).getYear.toLong)
        case "getmonth" =>
          VInt(java.time.LocalDateTime.ofInstant(dt(x(0)), java.time.ZoneOffset.UTC).getMonthValue.toLong)
        case "dayofmonth" =>
          VInt(java.time.LocalDateTime.ofInstant(dt(x(0)), java.time.ZoneOffset.UTC).getDayOfMonth.toLong)
        case "hourofday" =>
          VInt(java.time.LocalDateTime.ofInstant(dt(x(0)), java.time.ZoneOffset.UTC).getHour.toLong)
        // arrays
        case "pack_array"    => VArr(x.toVector)
        case "array_length"  => VInt(arr(x(0)).size.toLong)
        case "array_concat"  => VArr(arr(x(0)) ++ arr(x(1)))
        case "array_reverse" => VArr(arr(x(0)).reverse)
        case "array_index_of" => // 0-based position, -1 when absent
          VInt(arr(x(0)).indexOf(x(1)).toLong)
        case "split" => VArr(splitAdx(str(x(0)), str(x(1))))
        // bags (JSON-string currency; deterministic engine contracts)
        case "bag_pack" => // literal distinct keys, insertion order preserved
          VBag(x.grouped(2).map { case Vector(k, v) => (str(k), v) }.toVector)
        case "bag_merge" => // earlier argument wins; output keys SORTED
          val seen = scala.collection.mutable.LinkedHashMap[String, V]()
          x.foreach(b => bag(b).foreach { case (k, v) =>
            if (!seen.contains(k)) seen(k) = v
          })
          VBag(seen.toVector.sortBy(_._1))
        case "bag_set_key" => // set/overwrite one key (new pair merges first)
          val kv = (str(x(1)), x(2)) +: bag(x(0)).filterNot(_._1 == str(x(1)))
          VBag(kv.sortBy(_._1))
        case "bag_remove_keys" => // drop listed keys; output keys SORTED
          val drop = arr(x(1)).map(str).toSet
          VBag(bag(x(0)).filterNot(p => drop(p._1)).sortBy(_._1))
        case "bag_keys"    => VArr(bag(x(0)).map(p => VStr(p._1)))
        case "bag_has_key" => VBool(bag(x(0)).exists(_._1 == str(x(1))))
        case "extractjson" => // '$.key' scalar access; absent key → null
          val key = str(x(0)).stripPrefix("$.")
          bag(x(1)).collectFirst { case (k, v) if k == key =>
            v match { case VInt(l) => VStr(l.toString); case s: VStr => s; case o => o }
          }.getOrElse(VNull)
        case other => sys.error(s"evaluator hole: $other")
      }
  }

  private def cmp(a: V, b: V, f: Int => Boolean): VBool = (a, b) match {
    case (VInt(x), VInt(y)) => VBool(f(x.compareTo(y)))
    case (VDt(x), VDt(y))   => VBool(f(x.compareTo(y)))
    case (VStr(x), VStr(y)) => VBool(f(x.compareTo(y)))
    case _                  => sys.error("cmp type hole")
  }

  /** ADX split keeps empty entries ("a,,b" → [a,"",b]); java split drops
    * trailing ones, so split with -1 limit.
    */
  private def splitAdx(s: String, d: String): Vector[V] =
    s.split(java.util.regex.Pattern.quote(d), -1).toVector.map(VStr)

  // ---- generator -----------------------------------------------------------
  /** Deterministic case list: same (seed, n) → byte-identical compositions in
    * the ScalaTest lane and the FuzzDump/DuckDB lane.
    */
  def cases(n: Int, seed: Long): Seq[(Int, Ty, Node)] = {
    val g = new Gen(seed)
    val types = Vector(TStr, TInt, TDbl, TBool, TDt, TArrS, TArrI, TBag)
    (0 until n).map { i =>
      val t = types(i % types.size)
      (i, t, g.gen(t, 3))
    }
  }

  final class Gen(seed: Long) {
    private val rnd = new scala.util.Random(seed)

    private val strPool = Vector(
      "", "a", "abc", "graft", "a,b,c", "na-dup", "  pad  ", "x.y.z",
      "AbCdEf", "0012", "zzz", "m", "abcabc", "the lake", "k;v;w")
    private val dtPool = Vector(
      "2024-02-29T23:59:58Z", "2026-01-01T00:00:00Z", "2025-06-15T04:05:06Z",
      "2024-12-31T23:00:01Z", "2026-08-16T12:00:00Z").map(Instant.parse)
    private val dblPool = Vector(0.5, 1.25, 2.0, 3.75, 0.125, 7.5, 10.0, 0.0)
    // bag keys: plain identifiers (named_struct field names on the Spark side)
    private val keyPool = Vector("alpha", "beta", "gamma", "delta", "k1", "k2")

    private def litOf(t: Ty): Node = t match {
      case TStr  => Lit(VStr(strPool(rnd.nextInt(strPool.size))), TStr)
      case TInt  => Lit(VInt(rnd.nextInt(26) - 5L), TInt)
      case TDbl  => Lit(VDbl(dblPool(rnd.nextInt(dblPool.size))), TDbl)
      case TBool => Lit(VBool(rnd.nextBoolean()), TBool)
      case TDt   => Lit(VDt(dtPool(rnd.nextInt(dtPool.size))), TDt)
      case _     => sys.error("array/bag leaves come from constructor calls")
    }

    private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    /** One random node of type `t` with recursion budget `depth`. */
    def gen(t: Ty, depth: Int): Node = {
      def g(t2: Ty): Node = gen(t2, depth - 1)
      def leafInt(lo: Int, hi: Int) = Lit(VInt(lo + rnd.nextInt(hi - lo + 1).toLong), TInt)
      def part() = Lit(VStr(pick(Seq("day", "hour", "minute", "second"))), TStr)
      def key()  = Lit(VStr(pick(keyPool)), TStr)
      // distinct literal keys + scalar values — the named_struct bag shape
      def bagPack(nKeys: Int): Node = {
        val ks = rnd.shuffle(keyPool).take(nKeys)
        Call("bag_pack", ks.flatMap(k => Vector(
          Lit(VStr(k), TStr),
          if (rnd.nextBoolean()) g(TStr) else g(TInt))).toVector, TBag)
      }
      if (depth <= 0 && (t == TStr || t == TInt || t == TDbl || t == TBool || t == TDt)) litOf(t)
      else t match {
        case TDbl => pick[() => Node](Seq(
          () => litOf(TDbl),
          () => Call("d+", Vector(g(TDbl), g(TDbl)), TDbl),
          () => Call("d-", Vector(g(TDbl), g(TDbl)), TDbl),
          () => Call("d*", Vector(g(TDbl), litOf(TDbl)), TDbl),
          // domain-guarded transcendentals: args from pools/compositions that
          // stay finite and in-domain (pool ≥ 0; log/sqrt get +1 shifts)
          () => Call("exp", Vector(litOf(TDbl)), TDbl),
          // log/sqrt args squared (+1 for log): strictly in-domain even when
          // a nested d- composition goes negative
          () => { val n = g(TDbl)
                  Call("log", Vector(Call("d+",
                    Vector(Call("d*", Vector(n, n), TDbl), Lit(VDbl(1.0), TDbl)), TDbl)), TDbl) },
          () => Call("log10", Vector(Call("d+", Vector(litOf(TDbl), Lit(VDbl(1.0), TDbl)), TDbl)), TDbl),
          () => { val n = g(TDbl)
                  Call("sqrt", Vector(Call("d*", Vector(n, n), TDbl)), TDbl) },
          () => Call("sin", Vector(litOf(TDbl)), TDbl),
          () => Call("cos", Vector(litOf(TDbl)), TDbl),
          () => Call("pow", Vector(litOf(TDbl), Lit(VDbl(pick(Seq(2.0, 3.0, 0.5))), TDbl)), TDbl),
          // non-negative round arg (n²): Spark rounds half AWAY FROM ZERO,
          // java Math.round half-up — they differ only at negative .5s
          () => { val n = g(TDbl)
                  Call("round_d", Vector(Call("d*", Vector(n, n), TDbl), leafInt(0, 3)), TDbl) },
          () => Call("todouble", Vector(g(TInt)), TDbl),
          () => Call("iif", Vector(g(TBool), g(TDbl), g(TDbl)), TDbl)))()
        case TStr => pick[() => Node](Seq(
          () => litOf(TStr),
          () => Call("toupper", Vector(g(TStr)), TStr),
          () => Call("tolower", Vector(g(TStr)), TStr),
          () => Call("reverse", Vector(g(TStr)), TStr),
          () => Call("strcat", Vector(g(TStr), g(TStr)), TStr),
          () => Call("substring", Vector(g(TStr), leafInt(0, 6)), TStr),
          () => Call("substring", Vector(g(TStr), leafInt(0, 6), leafInt(0, 5)), TStr),
          () => Call("replace_string",
            Vector(g(TStr), Lit(VStr(pick(Seq("a", "b", "ab", "z", ","))), TStr),
              Lit(VStr(pick(Seq("", "X", "-", "aa"))), TStr)), TStr),
          () => Call("translate",
            Vector(Lit(VStr("abz"), TStr), Lit(VStr(pick(Seq("xyz", "ZYX", "120"))), TStr),
              g(TStr)), TStr),
          () => Call("strcat_array",
            Vector(g(TArrS), Lit(VStr(pick(Seq("-", "", "|"))), TStr)), TStr),
          () => Call("strrep", Vector(g(TStr), leafInt(1, 4)), TStr), // multiplier ≥ 1 in ADX
          () => Call("tostring", Vector(g(TInt)), TStr),
          // guaranteed-present key via bag_set_key, so null never flows into
          // a parent composition (the absent-key → null lane is a dedicated
          // deterministic assertion in the spec)
          () => { val k = pick(keyPool)
                  Call("extractjson", Vector(Lit(VStr("$." + k), TStr),
                    Call("bag_set_key", Vector(g(TBag), Lit(VStr(k), TStr),
                      g(TStr)), TBag)), TStr) },
          () => Call("iif", Vector(g(TBool), g(TStr), g(TStr)), TStr)))()
        case TInt => pick[() => Node](Seq(
          () => litOf(TInt),
          () => Call("strlen", Vector(g(TStr)), TInt),
          () => Call("indexof", Vector(g(TStr),
            Lit(VStr(pick(Seq("a", "b", "c", "ab", "q"))), TStr)), TInt),
          () => Call("+", Vector(g(TInt), g(TInt)), TInt),
          () => Call("-", Vector(g(TInt), g(TInt)), TInt),
          () => Call("*", Vector(g(TInt), leafInt(-3, 3)), TInt),
          () => Call("abs", Vector(g(TInt)), TInt),
          () => Call("min_of", Vector(g(TInt), g(TInt)), TInt),
          () => Call("max_of", Vector(g(TInt), g(TInt)), TInt),
          () => Call("bin", Vector(g(TInt), leafInt(1, 5)), TInt),
          () => Call("array_length", Vector(g(TArrS)), TInt),
          () => Call("array_index_of", Vector(g(TArrI), leafInt(-5, 20)), TInt),
          () => Call("datetime_diff", Vector(part(), g(TDt), g(TDt)), TInt),
          // 'aa'/'zz' are self-overlapping needles (strrep can build 'aaa',
          // 'zzz…' texts) — the lane that separates overlapping ADX countof
          // from the non-overlapping replace() trick
          () => Call("countof", Vector(g(TStr),
            Lit(VStr(pick(Seq("a", "b", "ab", "z", "aa", "zz"))), TStr)), TInt),
          () => Call("dayofyear", Vector(g(TDt)), TInt),
          () => Call("getyear", Vector(g(TDt)), TInt),
          () => Call("getmonth", Vector(g(TDt)), TInt),
          () => Call("dayofmonth", Vector(g(TDt)), TInt),
          () => Call("hourofday", Vector(g(TDt)), TInt),
          () => Call("iif", Vector(g(TBool), g(TInt), g(TInt)), TInt)))()
        case TBool => pick[() => Node](Seq(
          () => litOf(TBool),
          () => Call(pick(Seq("==", "!=", "<", "<=", ">", ">=")),
            Vector(g(TInt), g(TInt)), TBool),
          // strings order-compare only via == / != in ADX
          () => Call(pick(Seq("==", "!=")), Vector(g(TStr), g(TStr)), TBool),
          () => Call(pick(Seq("==", "<", ">")), Vector(g(TDt), g(TDt)), TBool),
          () => Call("and", Vector(g(TBool), g(TBool)), TBool),
          () => Call("or", Vector(g(TBool), g(TBool)), TBool),
          () => Call("not", Vector(g(TBool)), TBool),
          () => Call("isempty", Vector(g(TStr)), TBool),
          () => Call("isnotempty", Vector(g(TStr)), TBool),
          () => Call("bag_has_key", Vector(g(TBag), key()), TBool)))()
        case TDt => pick[() => Node](Seq(
          () => litOf(TDt),
          () => Call("datetime_add", Vector(part(), leafInt(-30, 30), g(TDt)), TDt),
          // week only on the ADD side: datetime_diff('week') counts
          // week-boundary crossings whose start-of-week convention differs
          // between ADX (Sunday) and DuckDB (ISO Monday) — not twinnable
          () => Call("datetime_add",
            Vector(Lit(VStr("week"), TStr), leafInt(-4, 4), g(TDt)), TDt),
          () => Call("startofday", Vector(g(TDt)), TDt),
          () => Call("startofmonth", Vector(g(TDt)), TDt),
          () => Call("startofyear", Vector(g(TDt)), TDt),
          () => Call("iif", Vector(g(TBool), g(TDt), g(TDt)), TDt)))()
        case TArrS => pick[() => Node](Seq(
          () => Call("pack_array", Vector(g(TStr), g(TStr)), TArrS),
          () => Call("pack_array", Vector(g(TStr), g(TStr), g(TStr)), TArrS),
          () => Call("split", Vector(g(TStr),
            Lit(VStr(pick(Seq(",", ";", "a"))), TStr)), TArrS),
          () => Call("array_concat", Vector(g(TArrS), g(TArrS)), TArrS),
          () => Call("array_reverse", Vector(g(TArrS)), TArrS),
          () => Call("bag_keys", Vector(g(TBag)), TArrS)))()
        case TArrI => pick[() => Node](Seq(
          () => Call("pack_array", Vector(g(TInt), g(TInt)), TArrI),
          () => Call("pack_array", Vector(g(TInt), g(TInt), g(TInt)), TArrI),
          () => Call("array_concat", Vector(g(TArrI), g(TArrI)), TArrI),
          () => Call("array_reverse", Vector(g(TArrI)), TArrI)))()
        case TBag if depth <= 0 => bagPack(2) // recursion floor: bags bottom out in bag_pack
        case TBag => pick[() => Node](Seq(
          () => bagPack(2),
          () => bagPack(3),
          () => Call("bag_merge", Vector(g(TBag), g(TBag)), TBag),
          () => Call("bag_set_key", Vector(g(TBag), key(),
            if (rnd.nextBoolean()) g(TStr) else g(TInt)), TBag),
          () => Call("bag_remove_keys", Vector(g(TBag),
            Call("pack_array", Vector(key(), key()), TArrS)), TBag)))()
      }
    }
  }

  /** JSON string-content escaper shared by every dump lane (expectedJson and
    * FuzzDump) — ONE copy, so an escaping gap cannot be fixed in one lane
    * and silently persist in the other (round-16 review finding #4). All
    * control chars < 0x20 escape (json.loads rejects them raw).
    */
  def jsonEscape(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case '\n'          => "\\n"
    case c if c < 0x20 => f"\\u${c.toInt}%04x"
    case c             => c.toString
  }

  /** The ops in a composition with no DuckDB twin — the per-family skip
    * census (round-15 verdict #6): FuzzDump stamps these on every untwinned
    * case so check_fuzz can report WHY each skip happened instead of
    * dropping them silently. Must stay in sync with renderDuck's None arm.
    */
  def unduckableOps(n: Node): Seq[String] =
    duck(n).left.getOrElse(Vector.empty)

  /** Typed JSON for the dump lane (`{"t":…,"v":…}`); bag values never reach
    * the dump (no DuckDB twin), but serialize for completeness.
    */
  def expectedJson(v: V): String = {
    def esc(s: String) = jsonEscape(s)
    v match {
      case VStr(s)  => s"""{"t":"str","v":"${esc(s)}"}"""
      case VInt(l)  => s"""{"t":"int","v":$l}"""
      case VDbl(d)  => s"""{"t":"dbl","v":${if (d.isNaN) "\"NaN\"" else d.toString}}"""
      case VBool(b) => s"""{"t":"bool","v":$b}"""
      case VDt(i)   => s"""{"t":"dt","v":"${i.toString}"}"""
      case VArr(vs) => s"""{"t":"arr","v":[${vs.map(expectedJson).mkString(",")}]}"""
      case VBag(kv) =>
        s"""{"t":"bag","v":[${kv.map { case (k, x) => s"""["${esc(k)}",${expectedJson(x)}]""" }.mkString(",")}]}"""
      case VNull    => s"""{"t":"null"}"""
    }
  }
}
