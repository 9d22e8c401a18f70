package graft.functions

import graft.SparkSuite

/** parse_ipv6 / ipv6_compare / ipv6_is_match over the native ipv6_norm
  * expression: canonical-form fixtures (RFC shapes), malformed-input nulls,
  * and the codegen path (selectExpr → whole-stage) against known answers.
  */
class Ipv6Spec extends SparkSuite {

  private def one(exprStr: String): org.apache.spark.sql.Row =
    spark.range(1).selectExpr(KqlCompat.rewrite(exprStr) + " as v").head()

  test("parse_ipv6 canonicalizes compression, embedded and plain IPv4") {
    assert(one("parse_ipv6('::1')").getString(0) ==
      "0000:0000:0000:0000:0000:0000:0000:0001")
    assert(one("parse_ipv6('2001:db8::8a2e:370:7334')").getString(0) ==
      "2001:0db8:0000:0000:0000:8a2e:0370:7334")
    assert(one("parse_ipv6('::ffff:192.168.0.1')").getString(0) ==
      "0000:0000:0000:0000:0000:ffff:c0a8:0001")
    // plain IPv4 maps to ::ffff:a.b.c.d, the ADX convention
    assert(one("parse_ipv6('127.0.0.1')").getString(0) ==
      "0000:0000:0000:0000:0000:ffff:7f00:0001")
    assert(one("parse_ipv6('::')").getString(0) ==
      "0000:0000:0000:0000:0000:0000:0000:0000")
    assert(one("parse_ipv6('1:2:3:4:5:6:7:8')").getString(0) ==
      "0001:0002:0003:0004:0005:0006:0007:0008")
  }

  test("parse_ipv6 nulls out malformed input") {
    for (bad <- Seq("", "not-an-ip", "1::2::3", "1:2:3:4:5:6:7:8:9",
        "1:2:3:4:5:6:7", "12345::", ":::", "1:2:3:4:5:6:7::8",
        "fe80::1%eth0", "2001:db8::/48", "256.1.1.1", "01.2.3.4"))
      assert(one(s"parse_ipv6('$bad')").isNullAt(0), s"should be null: '$bad'")
  }

  test("ipv6_compare orders canonically; null poisons") {
    assert(one("ipv6_compare('::1', '0:0:0:0:0:0:0:1')").getInt(0) == 0)
    assert(one("ipv6_compare('::1', '::2')").getInt(0) == -1)
    assert(one("ipv6_compare('2001:db8::', '::ffff:1.2.3.4')").getInt(0) == 1)
    assert(one("ipv6_compare('bogus', '::1')").isNullAt(0))
  }

  test("ipv6_is_match compares the top prefix bits") {
    assert(one("ipv6_is_match('2001:db8:0:1::1', '2001:db8:0:2::9', 48)").getBoolean(0))
    assert(!one("ipv6_is_match('2001:db8:0:1::1', '2001:db9:0:1::1', 48)").getBoolean(0))
    assert(one("ipv6_is_match('::1', '0:0::0:1')").getBoolean(0)) // full /128
    assert(!one("ipv6_is_match('::1', '::2')").getBoolean(0))
    val e = intercept[IllegalArgumentException](one("ipv6_is_match('::1', '::2', 50)"))
    assert(e.getMessage.contains("multiple of 4"))
  }

  test("interpreted eval matches codegen") {
    import graft.functions.expressions.Ipv6Norm
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- Seq("::1", "2001:db8::8a2e:370:7334", "10.0.0.1", "junk")) {
      val interp = Option(Ipv6Norm.normalize(UTF8String.fromString(s))).map(_.toString)
      val gen    = Option(one(s"parse_ipv6('$s')").getString(0))
      assert(interp == gen, s)
    }
  }
}
