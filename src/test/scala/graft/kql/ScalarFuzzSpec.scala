package graft.kql

import graft.SparkSuite
import graft.functions.KqlCompat
import graft.tools.ScalarFuzz
import graft.tools.ScalarFuzz._

/** Semantic differential fuzzing of the KQL scalar layer (round-13 verdict
  * ask #4; generator/evaluator/renderers live in [[graft.tools.ScalarFuzz]]
  * since round 15 so the DuckDB second-referee lane — `graft.tools.FuzzDump`
  * + `scripts/check_fuzz.py` — replays the IDENTICAL seeded case list).
  * This spec is the Spark lane: each composition is rendered to KQL, pushed
  * through `KqlCompat.rewrite` → Spark, and compared against the independent
  * ADX-semantics evaluator. Round 15 extends generation to the dynamic BAG
  * family (bag_pack / bag_merge / bag_set_key / bag_remove_keys / bag_keys /
  * bag_has_key / extractjson — the engine's JSON-string currency), which was
  * the one typed family with no fuzz lane.
  */
class ScalarFuzzSpec extends SparkSuite {

  /** The standing (seed, N) — must match FuzzDump's defaults so the two
    * referees judge the same compositions.
    */
  private val N    = 800
  private val Seed = 20260816L

  // ---- spark-side decoding and comparison ----------------------------------
  private val M = new com.fasterxml.jackson.databind.ObjectMapper()

  private def decodeBag(json: String): V = {
    val node = M.readTree(json)
    require(node.isObject, s"bag result is not a JSON object: $json")
    val kv = Vector.newBuilder[(String, V)]
    node.properties().forEach { e =>
      val v = e.getValue
      kv += ((e.getKey,
        if (v.isTextual) VStr(v.asText)
        else if (v.isIntegralNumber) VInt(v.asLong)
        else sys.error(s"bag value decode hole: $v in $json")))
    }
    VBag(kv.result())
  }

  private def decode(got: Any, t: Ty): V = (got, t) match {
    case (null, _)                   => VNull
    case (s: String, TStr)           => VStr(s)
    case (s: String, TBag)           => decodeBag(s)
    case (l: Long, TInt)             => VInt(l)
    case (i: Integer, TInt)          => VInt(i.toLong)
    case (d: java.lang.Double, TDbl) => VDbl(d)
    case (l: Long, TDbl)             => VDbl(l.toDouble)
    case (i: Integer, TDbl)          => VDbl(i.toDouble)
    case (d: java.math.BigDecimal, TDbl) => VDbl(d.doubleValue)
    case (b: java.lang.Boolean, TBool) => VBool(b)
    case (ts: java.sql.Timestamp, TDt) => VDt(ts.toInstant)
    case (a: scala.collection.Seq[_], TArrS) =>
      VArr(a.map(x => VStr(x.asInstanceOf[String])).toVector)
    case (a: scala.collection.Seq[_], TArrI) =>
      VArr(a.map {
        case l: Long => VInt(l); case i: Integer => VInt(i.toLong)
        case o => sys.error(s"int array decode hole: $o")
      }.toVector)
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
    case (VBag(as), VBag(bs)) =>
      as.size == bs.size && as.zip(bs).forall { case ((k1, x), (k2, y)) =>
        k1 == k2 && agree(x, y)
      }
    case (a, b) => a == b
  }

  test(s"$N random typed scalar compositions agree with the ADX-semantics evaluator") {
    val cases = ScalarFuzz.cases(N, Seed).map { case (i, t, n) =>
      (i, t, ScalarFuzz.render(n), ScalarFuzz.eval(n))
    }

    val failures = Seq.newBuilder[String]
    cases.grouped(40).foreach { batch =>
      val sqls = batch.map { case (i, _, kql, _) =>
        s"${KqlCompat.rewrite(kql)} AS c$i"
      }
      val row = spark.range(1).selectExpr(sqls: _*).head
      batch.zipWithIndex.foreach { case ((i, t, kql, expected), j) =>
        val got = decode(row.get(j), t)
        if (!agree(expected, got))
          failures += s"#$i KQL: $kql\n   SQL: ${KqlCompat.rewrite(kql)}\n" +
            s"   expected: $expected\n   got:      $got"
      }
    }
    val bad = failures.result()
    assert(bad.isEmpty,
      s"\n${bad.size} of $N fuzzed expressions diverged:\n${bad.take(12).mkString("\n")}")
  }

  test("extractjson of an absent key is null (the lane the generator avoids)") {
    val kql = "extractjson('$.missing', bag_pack('alpha', 1, 'beta', 'x'))"
    val got = spark.range(1).selectExpr(s"${KqlCompat.rewrite(kql)} AS c").head.get(0)
    assert(got == null, s"absent-key extractjson returned $got")
  }

  test("duck renderer covers every composition of the standing case list") {
    // the DuckDB lane must not silently shrink: since the r17 bag-family
    // port (JSON-type twins) every composition gets a twin except the
    // structural datetime non-literal-unit refusal, which this seed's
    // generator never produces (units come from literal pools). A renderer
    // hole would surface here, not as silent skips.
    val cs = ScalarFuzz.cases(N, Seed)
    val missing = cs.filter { case (_, _, n) => ScalarFuzz.renderDuck(n).isEmpty }
    assert(missing.isEmpty,
      s"${missing.size} compositions lack a DuckDB twin: " +
        missing.take(3).map(c => ScalarFuzz.render(c._3)).mkString(" | "))
  }
}
