package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewJoinSpec extends SparkSuite {

  test("salted join is row-identical to the plain join and spreads hot keys") {
    import spark.implicits._
    // hot key 1 dominates (the power-law shape salting exists for)
    val fact = (Seq.fill(500)(1L) ++ (2L to 50L)).map(k => (k, k * 10)).toDF("k", "v")
    val dim  = (1L to 50L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain  = fact.join(dim, Seq("k")).orderBy("k", "v", "name").collect().toSeq
    val salted = SkewJoin.saltedJoin(fact, dim, "k", buckets = 8)
      .orderBy("k", "v", "name").collect().toSeq
    assert(salted == plain)
    assert(salted.size == 549)
  }

  test("inputs with a colliding _salt column or a map column still work") {
    import spark.implicits._
    // _salt exists on the fact side: the helper must pick a fresh name and
    // leave the user's column intact
    val fact = Seq((1L, "a", 7), (1L, "b", 8), (2L, "c", 9)).toDF("k", "v", "_salt")
    val dim  = Seq((1L, "x"), (2L, "y")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(fact, dim, "k", buckets = 4)
    assert(out.columns.count(_ == "_salt") == 1) // the user's, not the helper's
    assert(out.select(sum(col("_salt"))).collect().head.getLong(0) == 24L)
    assert(out.count() == 3)

    // a map-typed column would break a whole-row xxhash64 at analysis time;
    // the key+ordinal salt must not touch it
    val factMap = Seq((1L, Map("a" -> 1)), (2L, Map("b" -> 2))).toDF("k", "props")
    assert(SkewJoin.saltedJoin(factMap, dim, "k", buckets = 4).count() == 2)
  }
}
