package graft.functions

import graft.SparkSuite

/** gamma/loggamma/beta_cdf/parse_csv: closed-form values, domain nulls,
  * RFC-4180 quoting.
  */
class MathFnsSpec extends SparkSuite {

  import spark.implicits._

  private def d1(sql: String): Double =
    spark.sql(s"SELECT $sql").head().getDouble(0)

  test("gamma(n+1) = n! exactly to 1e-9 relative") {
    for ((n, fact) <- Seq(1 -> 1.0, 4 -> 24.0, 7 -> 5040.0, 10 -> 3628800.0)) {
      val g = d1(s"gamma(CAST(${n + 1} AS DOUBLE))")
      assert(math.abs(g - fact) / fact < 1e-9, s"gamma(${n + 1}) = $g != $fact")
    }
  }

  test("loggamma matches log(gamma) and the domain nulls out") {
    assert(math.abs(d1("loggamma(7.5)") - math.log(d1("gamma(7.5)"))) < 1e-9)
    assert(spark.sql("SELECT gamma(-1.0)").head().isNullAt(0))
    assert(spark.sql("SELECT loggamma(0.0)").head().isNullAt(0))
  }

  test("beta_cdf hits the integer-parameter closed forms") {
    // I_x(2,2) = 3x^2 - 2x^3 ; I_x(1,1) = x ; I_x(2,1) = x^2
    for (x <- Seq(0.1, 0.25, 0.5, 0.9)) {
      assert(math.abs(d1(s"beta_cdf($x, 2.0, 2.0)") - (3 * x * x - 2 * x * x * x)) < 1e-12)
      assert(math.abs(d1(s"beta_cdf($x, 1.0, 1.0)") - x) < 1e-12)
      assert(math.abs(d1(s"beta_cdf($x, 2.0, 1.0)") - x * x) < 1e-12)
    }
    assert(d1("beta_cdf(0.0, 3.0, 4.0)") == 0.0)
    assert(d1("beta_cdf(1.0, 3.0, 4.0)") == 1.0)
    assert(spark.sql("SELECT beta_cdf(1.5, 2.0, 2.0)").head().isNullAt(0))
    assert(spark.sql("SELECT beta_cdf(0.5, 0.0, 2.0)").head().isNullAt(0))
  }

  test("parse_csv: plain, embedded commas, doubled quotes, empties") {
    def fields(lit: String): Seq[String] =
      spark.sql(s"SELECT parse_csv($lit)").as[Seq[String]].head()
    assert(fields("'a,b,c'") == Seq("a", "b", "c"))
    assert(fields("'a,\"b,c\",d'") == Seq("a", "b,c", "d"))
    assert(fields("'\"he said \"\"hi\"\"\",x'") == Seq("he said \"hi\"", "x"))
    assert(fields("'a,,c'") == Seq("a", "", "c"))
    assert(spark.sql("SELECT parse_csv(CAST(NULL AS STRING))").head().isNullAt(0))
  }
}
