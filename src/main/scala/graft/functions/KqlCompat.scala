package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** KQL scalar-function compatibility (§2.i): the reference's only user
  * extensibility point is a KQL scalar expression string (`--creation-time`,
  * CommandLineOptions.cs:16-20) evaluated per partition tuple; its generated
  * queries use a small scalar surface (SURVEY §2.g). Spark's `expr()` gives
  * the evaluation engine; this object supplies the KQL spellings — both as
  * typed Column functions and as a textual rewrite so reference-flavored
  * expression strings (e.g. `todatetime(strcat(p0,'-01-01'))`, the
  * reference tests' default — ElectricTestBase.cs:13) run unchanged.
  */
object KqlCompat {

  // ---- typed aliases ------------------------------------------------------

  def todatetime(c: Column): Column      = c.cast("timestamp")
  def tostring(c: Column): Column        = c.cast("string")
  def toint(c: Column): Column           = c.cast("int")
  def tolong(c: Column): Column          = c.cast("long")
  def todouble(c: Column): Column        = c.cast("double")
  def strcat(cs: Column*): Column        = concat(cs: _*)
  def iff(p: Column, a: Column, b: Column): Column = when(p, a).otherwise(b)
  /** KQL `has`: term match (we approximate with case-insensitive contains,
    * like KustoClusterGateway.cs:73's usage).
    */
  def has(c: Column, term: String): Column = lower(c).contains(term.toLowerCase)
  def argMax(value: Column, ordering: Column): Column = max_by(value, ordering)

  // ---- textual rewrite for expression strings -----------------------------

  private val FnRewrites: Seq[(String, String)] = Seq(
    "todatetime(" -> "to_timestamp(",
    "tostring("   -> "cast_string_helper(", // placeholder, expanded below
    "strcat("     -> "concat(",
    "toint("      -> "cast_int_helper(",
    "tolong("     -> "cast_long_helper(",
    "todouble("   -> "cast_double_helper(",
    "arg_max("    -> "max_by(",
    "iff("        -> "if("
  )

  /** Rewrite a KQL-flavored scalar expression into Spark SQL accepted by
    * `expr()`. Handles the function spellings above plus `datetime(...)`
    * literals. Spark-SQL-native input passes through untouched (all rewrites
    * are no-ops on strings that don't use KQL spellings).
    */
  def rewrite(kql: String): String = {
    var s = kql
    // datetime(2021-01-01) literal → timestamp'2021-01-01'; the negative
    // look-behind keeps `todatetime(` intact
    s = "(?<![A-Za-z0-9_])datetime\\(([^)']*)\\)".r
      .replaceAllIn(s, m => s"timestamp'${m.group(1).trim}'")
    FnRewrites.foreach { case (from, to) => s = s.replace(from, to) }
    // cast helpers: cast_<t>_helper(x) → cast(x as <t>)
    for (t <- Seq("string", "int", "long", "double")) {
      val re = s"cast_${t}_helper\\(".r
      while (re.findFirstIn(s).isDefined) {
        val start = s.indexOf(s"cast_${t}_helper(")
        val open  = start + s"cast_${t}_helper".length
        var depth = 0; var i = open
        while (i < s.length && (depth != 0 || i == open)) {
          if (s.charAt(i) == '(') depth += 1
          else if (s.charAt(i) == ')') depth -= 1
          i += 1
        }
        val inner = s.substring(open + 1, i - 1)
        s = s.substring(0, start) + s"cast($inner as $t)" + s.substring(i)
      }
    }
    s
  }
}
