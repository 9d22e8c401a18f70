package graft.functions

import graft.SparkSuite
import graft.functions.expressions.Punycode

class PunycodeSpec extends SparkSuite {

  test("RFC 3492 vectors encode and decode") {
    val cases = Seq(
      "münchen" -> "mnchen-3ya",
      "bücher"  -> "bcher-kva",
      "hello"   -> "hello-",        // basic-only keeps the delimiter
      "ünïcödé" -> "ncd-dma1a7bzb",
      "日本語"   -> "wgv71a119e",
      ""        -> "")
    cases.foreach { case (u, p) =>
      assert(Punycode.encode(u) == p, s"encode($u)")
      assert(Punycode.decode(p) == u, s"decode($p)")
    }
    // malformed: digits out of alphabet range / truncated tail
    assert(Punycode.decode("zzz999") == null)
    assert(Punycode.decode("abc-!") == null)
  }

  test("registered SQL functions round-trip through the session extension") {
    val r = spark.sql(
      """SELECT punycode_from_string('münchen') AS e,
        |       punycode_to_string('mnchen-3ya') AS d,
        |       punycode_to_string(punycode_from_string('ünïcödé')) AS rt,
        |       punycode_to_string('zzz999') AS bad""".stripMargin).head
    assert(r.getString(0) == "mnchen-3ya")
    assert(r.getString(1) == "münchen")
    assert(r.getString(2) == "ünïcödé")
    assert(r.isNullAt(3))
  }

  test("encoder survives a long ASCII prefix before an astral code point") {
    // (m - n) * (h + 1) reaches ~2^42 here — an Int delta silently wrapped
    // (the round-9 ADVICE finding); Long arithmetic must round-trip it
    val s = "a" * 3000 + new String(Character.toChars(0x10FFFF))
    val enc = Punycode.encode(s)
    assert(enc != null && enc.nonEmpty)
    assert(Punycode.decode(enc) === s)
  }
}
