package graft.operators

import graft.SparkSuite

/** Whole-registry codegen health: every query must execute with Spark's
  * silent interpreted fallbacks DISABLED.
  *
  * Why this exists: `BloomContainsBc.doGenCode` emitted a call to a method
  * declaring `throws IOException`; janino rejected the generated class and
  * Spark fell back to an INTERPRETED filter for the whole stage — costing
  * two rounds of "warm-up curve" adjudication essays before the 100×
  * profiler surfaced the compile error (round-16, dedup_substring_spans).
  * The fallback is a production safety net, but in CI it hides exactly the
  * regressions this suite exists to catch:
  *
  *   - `spark.sql.codegen.fallback=false`   — a WholeStageCodegen compile
  *     failure throws instead of silently re-planning interpreted;
  *   - `spark.sql.codegen.factoryMode=CODEGEN_ONLY` — predicate/projection
  *     generators (GeneratePredicate, UnsafeProjection, …) throw instead of
  *     silently constructing interpreted evaluators.
  *
  * Runs the full registry at sf0.001 (cheap; the one scale-dependent codegen
  * path — the >256KB broadcast bloom — has its own dedicated PlanSpec test).
  */
class CodegenHealthSpec extends SparkSuite {

  test("every registry query executes with codegen fallbacks disabled") {
    val sf     = "/root/testdata/sf0.001"
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val failures = Surface.registry.toSeq.sortBy(_._1).flatMap { case (name, q) =>
        try { q.fn(spark, sf).count(); None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | ").take(300))
        } finally graft.Bench.releaseAll(spark)
      }
      assert(failures.isEmpty,
        s"${failures.size} queries fail with codegen forced (a silent interpreted " +
          s"fallback in production):\n${failures.take(10).mkString("\n")}")
    } finally {
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(k, x)
        case None    => spark.conf.unset(k)
      }
      restore("spark.sql.codegen.fallback", prevFb)
      restore("spark.sql.codegen.factoryMode", prevFm)
    }
  }
}
