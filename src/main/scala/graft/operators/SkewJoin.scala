package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for fact⋈dim equi-joins at 100 TB: when a handful of hot
  * keys dominate (the classic power-law user/event distribution), a plain
  * shuffle join sends every hot-key row to one reducer. Salting splits each
  * key's rows across `buckets` reducers: the fact side gets a deterministic
  * per-row salt, the (small) dim side is replicated once per salt value, and
  * the join key becomes (key, salt). Result is row-identical to the unsalted
  * join — only the partitioning changes — so the DuckDB oracle is the plain
  * join SQL.
  *
  * Complements AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`):
  * AQE repairs skew it can observe at shuffle time; salting prevents it by
  * construction and also covers aggregations AQE can't split.
  */
object SkewJoin {

  /** Salted inner equi-join on `key`. `dim` is replicated `buckets`× — keep
    * it the small side. The salt combines the join key with a
    * partition-stable row ordinal: deterministic under task retry (the same
    * input split recomputes the same ordinals — no `rand()`), spreads every
    * hot key's rows across buckets, and does not depend on the other fact
    * columns' types (a whole-row hash breaks on map columns, which xxhash64
    * rejects at analysis). The salt column name is generated to not collide
    * with either input's columns.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val taken = (fact.columns ++ dim.columns).toSet
    val salt  = Iterator.iterate("_salt")(_ + "_").dropWhile(taken).next()
    val saltedFact = fact.withColumn(salt,
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets)).cast("int"))
    val expandedDim = dim.withColumn(salt,
      explode(array((0 until buckets).map(b => lit(b)): _*)))
    saltedFact.join(expandedDim, Seq(key, salt)).drop(salt)
  }
}
