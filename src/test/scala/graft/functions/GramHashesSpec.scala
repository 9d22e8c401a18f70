package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.GramHashes

/** gram_hashes: the O(n) sliding-window shingle hash must agree with the
  * definitional per-window polynomial, respect CHARACTER (not byte)
  * windows, and give equal hashes exactly for equal substrings.
  */
class GramHashesSpec extends SparkSuite {

  /** Definitional hash of one window: plain polynomial over code points. */
  private def windowHash(s: String, from: Int, k: Int): Long = {
    var h = 0L
    s.codePoints().toArray.slice(from, from + k).foreach(cp => h = h * GramHashes.Base + cp)
    h
  }

  test("matches the definitional per-window polynomial (ASCII and multi-byte)") {
    for (s <- Seq("abcdefgh", "ρωμαϊκό κείμενο εδώ", "mixed é text 😀 tail", "aaaa")) {
      val k = 3
      val got = GramHashes.compute(s.getBytes("UTF-8"), k)
      val nChars = s.codePointCount(0, s.length)
      assert(got.length == math.max(0, nChars - k + 1), s)
      got.zipWithIndex.foreach { case (h, i) => assert(h == windowHash(s, i, k), s"$s @$i") }
    }
  }

  test("equal k-char substrings hash equal; shifted content hashes differ") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "QQQ quick brown fox QQQQQ"
    val ha = GramHashes.compute(a.getBytes("UTF-8"), 10)
    val hb = GramHashes.compute(b.getBytes("UTF-8"), 10)
    // " quick bro" occurs at a@3 and b@3
    assert(ha(3) == hb(3))
    assert(ha.toSet.intersect(hb.toSet).nonEmpty)
    assert(ha(0) != ha(1)) // neighbours differ
  }

  test("shorter than k yields empty; k == length yields one hash") {
    assert(GramHashes.compute("ab".getBytes("UTF-8"), 3).isEmpty)
    assert(GramHashes.compute("abc".getBytes("UTF-8"), 3).length == 1)
  }

  test("SQL surface agrees with the direct computation (codegen path)") {
    import spark.implicits._
    val rows = Seq("sliding window hash", "short", "ααββγγδδ εεζζ ηηθθ")
      .toDF("t")
      .select(col("t"), GramHashes.gramHashes(col("t"), 5).as("hs"))
      .collect()
    rows.foreach { r =>
      val expected = GramHashes.compute(r.getString(0).getBytes("UTF-8"), 5)
      assert(r.getSeq[Long](1) == expected.toSeq, r.getString(0))
    }
  }

  test("property: sliding hashes equal the definitional polynomial on random unicode text") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.propBoolean
    val pieceGen = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString), 2 -> Gen.oneOf(" ", "-", ","),
      1 -> Gen.oneOf("é", "ß", "λ", "中", "😀")) // incl. a surrogate pair
    val textGen = Gen.listOf(pieceGen).map(_.mkString)
    val prop = Prop.forAll(textGen, Gen.choose(1, 7)) { (s: String, k: Int) =>
      val got = GramHashes.compute(s.getBytes("UTF-8"), k).toSeq
      val nChars = s.codePointCount(0, s.length)
      val expected = (0 to nChars - k).map(i => windowHash(s, i, k))
      got == expected
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("window equality matches substring equality on a realistic doc pair") {
    // the dedup_substring_spans contract: candidate pairs from hash equality
    // == pairs from true 50-char substring equality (no collisions here)
    val base = "w" + ("abcdefghij" * 10) // 101 chars
    val other = "zz" + base.substring(1, 61) + "qqqq"
    val k = 50
    val h1 = GramHashes.compute(base.getBytes("UTF-8"), k)
    val h2 = GramHashes.compute(other.getBytes("UTF-8"), k)
    val subs1 = (0 to base.length - k).map(i => base.substring(i, i + k))
    val subs2 = (0 to other.length - k).map(i => other.substring(i, i + k))
    val byHash = for { i <- h1.indices; j <- h2.indices if h1(i) == h2(j) } yield (i, j)
    val byStr  = for { i <- subs1.indices; j <- subs2.indices if subs1(i) == subs2(j) } yield (i, j)
    assert(byHash == byStr)
    assert(byStr.nonEmpty) // the overlap actually exercises the match path
  }
}
