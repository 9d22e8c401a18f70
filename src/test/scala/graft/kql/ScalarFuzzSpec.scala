package graft.kql

import java.time.Instant
import java.time.temporal.ChronoUnit

import graft.SparkSuite
import graft.functions.KqlCompat

/** Semantic differential fuzzing of the KQL scalar layer (round-13 verdict
  * ask #4). The r13 fixpoint property caught SYNTACTIC double-rewrites; the
  * two bugs it found (substring's compounding +1 shift, translate's
  * re-permuted args) were arg-order/offset bugs that only a COMPOSITION
  * exposed. This spec generates seeded random typed compositions of the
  * scalar surface (string / integer / boolean / datetime / dynamic-array
  * families, depth ≤ 3), evaluates each through `KqlCompat.rewrite` →
  * Spark, and compares against an independent reference evaluator
  * implementing the ADX-documented semantics directly (0-based substring,
  * boundary-crossing datetime_diff, floor-aligned bin, char-map translate,
  * null-swallowing strcat, …).
  *
  * Scope notes: double-valued functions are excluded (tolerance machinery
  * would blunt the oracle); string literal leaves avoid quotes/backslashes
  * so literal-escaping can't mask semantic bugs; regex-taking functions and
  * functions with documented-arbitrary ordering (set_union) are out.
  * Divergences print the KQL, the rewritten SQL, expected and got.
  */
class ScalarFuzzSpec extends SparkSuite {

  // ---- value model ---------------------------------------------------------
  sealed trait V
  case class VStr(s: String)          extends V
  case class VInt(l: Long)            extends V
  case class VDbl(d: Double)          extends V
  case class VBool(b: Boolean)        extends V
  case class VDt(i: Instant)          extends V
  case class VArr(vs: Vector[V])      extends V

  sealed trait Ty
  case object TStr  extends Ty
  case object TInt  extends Ty
  case object TDbl  extends Ty // double-valued math family (tolerant compare)
  case object TBool extends Ty
  case object TDt   extends Ty
  case object TArrS extends Ty // array<string>
  case object TArrI extends Ty // array<long>

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
    case VArr(_) => sys.error("array literals render through pack_array calls")
  }

  private def render(n: Node): String = n match {
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

  // ---- the independent evaluator (ADX-documented semantics) ----------------
  private def str(v: V): String   = v.asInstanceOf[VStr].s
  private def int(v: V): Long     = v.asInstanceOf[VInt].l
  private def bool(v: V): Boolean = v.asInstanceOf[VBool].b
  private def dt(v: V): Instant   = v.asInstanceOf[VDt].i
  private def arr(v: V): Vector[V] = v.asInstanceOf[VArr].vs
  private def dbl(v: V): Double = v match {
    case VDbl(d) => d
    case VInt(l) => l.toDouble
    case other   => sys.error(s"dbl type hole: $other")
  }

  private def chrono(part: String): ChronoUnit = part match {
    case "day" => ChronoUnit.DAYS; case "hour" => ChronoUnit.HOURS
    case "minute" => ChronoUnit.MINUTES; case "second" => ChronoUnit.SECONDS
  }

  private def eval(n: Node): V = n match {
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
          VDt(dt(x(2)).plus(int(x(1)), chrono(str(x(0)))))
        case "datetime_diff" =>
          // ADX: count of period BOUNDARIES crossed between 2nd and 1st arg
          // (datetime_diff('day', 01-02T23:59, 01-02T00:01) = 0;
          //  ...('day', 01-03T00:01, 01-02T23:59) = 1), fixed-width periods
          val u = chrono(str(x(0)))
          val t1 = dt(x(1)).truncatedTo(u); val t2 = dt(x(2)).truncatedTo(u)
          VInt(u.between(t2, t1))
        case "startofday" => VDt(dt(x(0)).truncatedTo(ChronoUnit.DAYS))
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
  private val rnd = new scala.util.Random(20260816L)

  private val strPool = Vector(
    "", "a", "abc", "graft", "a,b,c", "na-dup", "  pad  ", "x.y.z",
    "AbCdEf", "0012", "zzz", "m", "abcabc", "the lake", "k;v;w")
  private val dtPool = Vector(
    "2024-02-29T23:59:58Z", "2026-01-01T00:00:00Z", "2025-06-15T04:05:06Z",
    "2024-12-31T23:00:01Z", "2026-08-16T12:00:00Z").map(Instant.parse)

  private val dblPool = Vector(0.5, 1.25, 2.0, 3.75, 0.125, 7.5, 10.0, 0.0)

  private def litOf(t: Ty): Node = t match {
    case TStr  => Lit(VStr(strPool(rnd.nextInt(strPool.size))), TStr)
    case TInt  => Lit(VInt(rnd.nextInt(26) - 5L), TInt)
    case TDbl  => Lit(VDbl(dblPool(rnd.nextInt(dblPool.size))), TDbl)
    case TBool => Lit(VBool(rnd.nextBoolean()), TBool)
    case TDt   => Lit(VDt(dtPool(rnd.nextInt(dtPool.size))), TDt)
    case TArrS | TArrI => sys.error("array leaves come from pack_array/split")
  }

  private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

  /** One random node of type `t` with recursion budget `depth`. */
  private def gen(t: Ty, depth: Int): Node = {
    def g(t2: Ty): Node = gen(t2, depth - 1)
    def leafInt(lo: Int, hi: Int) = Lit(VInt(lo + rnd.nextInt(hi - lo + 1).toLong), TInt)
    def part() = Lit(VStr(pick(Seq("day", "hour", "minute", "second"))), TStr)
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
        () => Call("isnotempty", Vector(g(TStr)), TBool)))()
      case TDt => pick[() => Node](Seq(
        () => litOf(TDt),
        () => Call("datetime_add", Vector(part(), leafInt(-30, 30), g(TDt)), TDt),
        () => Call("startofday", Vector(g(TDt)), TDt),
        () => Call("iif", Vector(g(TBool), g(TDt), g(TDt)), TDt)))()
      case TArrS => pick[() => Node](Seq(
        () => Call("pack_array", Vector(g(TStr), g(TStr)), TArrS),
        () => Call("pack_array", Vector(g(TStr), g(TStr), g(TStr)), TArrS),
        () => Call("split", Vector(g(TStr),
          Lit(VStr(pick(Seq(",", ";", "a"))), TStr)), TArrS),
        () => Call("array_concat", Vector(g(TArrS), g(TArrS)), TArrS),
        () => Call("array_reverse", Vector(g(TArrS)), TArrS)))()
      case TArrI => pick[() => Node](Seq(
        () => Call("pack_array", Vector(g(TInt), g(TInt)), TArrI),
        () => Call("pack_array", Vector(g(TInt), g(TInt), g(TInt)), TArrI),
        () => Call("array_concat", Vector(g(TArrI), g(TArrI)), TArrI),
        () => Call("array_reverse", Vector(g(TArrI)), TArrI)))()
    }
  }

  // ---- spark-side decoding and comparison ----------------------------------
  private def decode(got: Any, t: Ty): Option[V] = (got, t) match {
    case (null, _)                   => None
    case (s: String, TStr)           => Some(VStr(s))
    case (l: Long, TInt)             => Some(VInt(l))
    case (i: Integer, TInt)          => Some(VInt(i.toLong))
    case (d: java.lang.Double, TDbl) => Some(VDbl(d))
    case (l: Long, TDbl)             => Some(VDbl(l.toDouble))
    case (i: Integer, TDbl)          => Some(VDbl(i.toDouble))
    case (d: java.math.BigDecimal, TDbl) => Some(VDbl(d.doubleValue))
    case (b: java.lang.Boolean, TBool) => Some(VBool(b))
    case (ts: java.sql.Timestamp, TDt) => Some(VDt(ts.toInstant))
    case (a: scala.collection.Seq[_], TArrS) =>
      Some(VArr(a.map(x => VStr(x.asInstanceOf[String])).toVector))
    case (a: scala.collection.Seq[_], TArrI) =>
      Some(VArr(a.map {
        case l: Long => VInt(l); case i: Integer => VInt(i.toLong)
        case o => sys.error(s"int array decode hole: $o")
      }.toVector))
    case other => sys.error(s"decode hole: $other / $t")
  }

  /** Equality with a relative tolerance on doubles (the transcendental
    * chain may differ by a few ulps between codegen'd Spark and the
    * evaluator's Math calls); everything else exact.
    */
  private def agree(expected: V, got: V): Boolean = (expected, got) match {
    case (VDbl(a), VDbl(b)) =>
      (a == b) || (a.isNaN && b.isNaN) ||
        math.abs(a - b) <= 1e-12 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    case (VArr(as), VArr(bs)) =>
      as.size == bs.size && as.zip(bs).forall { case (x, y) => agree(x, y) }
    case (a, b) => a == b
  }

  test("700 random typed scalar compositions agree with the ADX-semantics evaluator") {
    val N     = 700
    val types = Vector(TStr, TInt, TDbl, TBool, TDt, TArrS, TArrI)
    val cases = (0 until N).map { i =>
      val t = types(i % types.size)
      val n = gen(t, 3)
      (i, t, n, render(n), eval(n))
    }

    val failures = Seq.newBuilder[String]
    cases.grouped(40).foreach { batch =>
      val sqls = batch.map { case (i, _, _, kql, _) =>
        s"${KqlCompat.rewrite(kql)} AS c$i"
      }
      val row = spark.range(1).selectExpr(sqls: _*).head
      batch.zipWithIndex.foreach { case ((i, t, _, kql, expected), j) =>
        val got = decode(row.get(j), t)
        if (!got.exists(agree(expected, _)))
          failures += s"#$i KQL: $kql\n   SQL: ${KqlCompat.rewrite(kql)}\n" +
            s"   expected: $expected\n   got:      $got"
      }
    }
    val bad = failures.result()
    assert(bad.isEmpty,
      s"\n${bad.size} of $N fuzzed expressions diverged:\n${bad.take(12).mkString("\n")}")
  }
}
