package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.CountofScan

/** countof_scan: OVERLAPPING plain-text occurrence count (the ADX countof
  * 'normal' semantics) as one allocation-free byte scan — per-fixture
  * agreement between a naive character-offset oracle, the interpreted
  * reference implementation, and the codegen'd Spark result.
  */
class CountofScanSpec extends SparkSuite {

  import spark.implicits._

  // the naive definition: every character start offset where the needle
  // matches — overlaps included
  private def naive(text: String, needle: String): Long =
    if (needle.isEmpty) 0L
    else (0 to text.length - needle.length)
      .count(i => text.regionMatches(i, needle, 0, needle.length)).toLong

  private val texts = Seq(
    "aaa", "aaaa", "zz", "a a a a", "abcabcab", "", "a", "banana nabanana",
    "ababab", "ça va ça va", "中文中文中", "a a  a   a", " a a a ")

  private val needles = Seq("aa", "a a", "aba", "ana", " a ", "ç", "中文", "", "zzz")

  test("codegen result equals the naive overlapping count on every pair") {
    val df = texts.toDF("t")
    needles.foreach { n =>
      val got = df.select(col("t"), CountofScan.countofScan(col("t"), lit(n)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      texts.foreach { t =>
        assert(got(t) == naive(t, n), s"countof_scan('$t', '$n')")
      }
    }
  }

  test("interpreted reference implementation matches the naive count") {
    for (t <- texts; n <- needles)
      assert(CountofScan.countOverlapping(t.getBytes("UTF-8"), n.getBytes("UTF-8")) ==
        naive(t, n), s"countOverlapping('$t', '$n')")
  }

  test("null in, null out; non-string args refused") {
    val r = Seq((Option.empty[String], "aa")).toDF("t", "n")
      .select(CountofScan.countofScan(col("t"), col("n"))).collect()
    assert(r.head.isNullAt(0))
    intercept[Exception](
      Seq(1).toDF("x").select(CountofScan.countofScan(col("x"), lit("a"))).collect())
  }

  test("KqlCompat countof routes bordered needles through the native scan") {
    // a bordered literal (' a ' — prefix == suffix) must NOT take the
    // replace() shortcut (non-overlapping) and must count overlaps
    val rewritten = KqlCompat.rewrite("countof(' a a a ', ' a ')")
    assert(rewritten.contains("countof_scan"), rewritten)
    val v = spark.sql(s"SELECT $rewritten AS n").head().getLong(0)
    assert(v == 3L, s"overlapping countof(' a a a ', ' a ') = $v")
  }
}
