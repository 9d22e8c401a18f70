package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class KqlCompatSpec extends SparkSuite {
  import spark.implicits._

  test("rewrite handles the reference's default creation-time expression") {
    // ElectricTestBase.cs:13
    val out = KqlCompat.rewrite("todatetime(strcat(p0,'-01-01'))")
    assert(out == "to_timestamp(concat(p0,'-01-01'))")
    val r = Seq("2021").toDF("p0").withColumn("ct", expr(out)).head
    assert(r.getTimestamp(1).toString.startsWith("2021-01-01"))
  }

  test("rewrite handles casts, datetime literals, iff and passthrough") {
    assert(KqlCompat.rewrite("toint(tostring(x))") == "cast(cast(x as string) as int)")
    assert(KqlCompat.rewrite("datetime(2021-06-01)") == "timestamp'2021-06-01'")
    assert(KqlCompat.rewrite("iff(a > 1, 'x', 'y')") == "if(a > 1, 'x', 'y')")
    // Spark-SQL-native input untouched
    val native = "to_timestamp(concat(cast(p0 as string), '-01-01'))"
    assert(KqlCompat.rewrite(native) == native)
  }

  test("typed aliases evaluate with KQL semantics") {
    val df = Seq(("Personal Cluster", 3L)).toDF("offering", "v")
    val r = df.select(
      KqlCompat.has($"offering", "personal").as("h"),
      KqlCompat.strcat($"offering", lit("!"), KqlCompat.tostring($"v")).as("s"),
      KqlCompat.iff($"v" > 2, lit(1), lit(0)).as("i")).head
    assert(r.getBoolean(0))
    assert(r.getString(1) == "Personal Cluster!3")
    assert(r.getInt(2) == 1)
  }
}
