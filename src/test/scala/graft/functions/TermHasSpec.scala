package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.expressions.TermHas

/** term_has: the native whole-term scan must be BIT-COMPATIBLE with the
  * composed spelling `array_contains(split(lower(s), '[^0-9a-z]+'),
  * needle)` for ASCII-alphanumeric needles — on every boundary shape,
  * in both codegen and interpreted evaluation.
  */
class TermHasSpec extends SparkSuite {

  import spark.implicits._

  private val needles = Seq("admin", "a", "1", "z9", "spark")

  private val haystacks = Seq(
    "admin", "administrators", "the admin team", "Admin-ops", "ADMIN",
    "a", "", " ", "a b", "b a", "x,admin,y", "1 2 3", "z9", "z99", "9z9",
    "tailadmin", "admintail", "admin1", "1admin", "--admin--", "çadmin",
    "adminç", "ç admin ç", "中文 admin 中文", "中admin中", "spark sql",
    "sparksql", "SPARK", "sPaRk!", null
  )

  test("term_has equals the composed array spelling on every fixture pair") {
    val df = haystacks.toDF("s")
    needles.foreach { n =>
      val r = df.select(
        col("s"),
        TermHas.termHas(col("s"), lit(n)).as("native"),
        array_contains(split(lower(col("s")), "[^0-9a-z]+"), lit(n.toLowerCase)).as("composed"))
        .collect()
      r.foreach { row =>
        assert(row.isNullAt(1) == row.isNullAt(2),
          s"null disagreement for '${row.get(0)}' has '$n'")
        if (!row.isNullAt(1))
          assert(row.getBoolean(1) == row.getBoolean(2),
            s"'${row.get(0)}' has '$n': native=${row.getBoolean(1)} composed=${row.getBoolean(2)}")
      }
    }
  }

  test("interpreted fallback matches the generated code") {
    // the reference implementation IS the interpreted eval; exercise it
    // directly against the Spark (codegen) result
    val df = haystacks.filter(_ != null).toDF("s")
    needles.foreach { n =>
      val needle = n.toLowerCase.getBytes("UTF-8")
      val fromSpark = df.select(col("s"), TermHas.termHas(col("s"), lit(n)))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      haystacks.filter(_ != null).foreach { h =>
        assert(TermHas.termContains(h.getBytes("UTF-8"), needle) == fromSpark(h),
          s"'$h' has '$n'")
      }
    }
  }

  test("non-alphanumeric or empty needles are refused by type-checking") {
    val df = Seq("a b").toDF("s")
    intercept[Exception](df.select(TermHas.termHas(col("s"), lit("a b"))).collect())
    intercept[Exception](df.select(TermHas.termHas(col("s"), lit(""))).collect())
    intercept[Exception](df.select(TermHas.termHas(col("s"), col("s"))).collect())
  }
}
