package graft.operators

import graft.{SparkEntry, SparkSuite}

/** Guard: every registered query (and the flagship entry) must run at
  * sf0.001 and produce a sane, fully-named result — catches accidental
  * regressions long before the driver's sf0.01 gate.
  */
class SurfaceSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys with matching column names in SQL") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.size >= 30)
  }

  Surface.registry.foreach { case (name, q) =>
    test(s"query runs at sf0.001: $name") {
      val df = q.fn(spark, sf)
      // no auto-generated column names may leak into results
      assert(!df.columns.exists(c => c.contains("(") || c.contains(")")), df.columns.mkString(","))
      df.count() // must execute
    }
  }
}
