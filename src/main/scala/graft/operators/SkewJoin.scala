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
    * it the small side. The salt is a deterministic hash of the entire fact
    * row, so results are stable run-to-run (no `rand()`, which would break
    * retry idempotency at scale).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(buckets)).cast("int"))
    val expandedDim = dim.withColumn("_salt",
      explode(array((0 until buckets).map(b => lit(b)): _*)))
    saltedFact.join(expandedDim, Seq(key, "_salt")).drop("_salt")
  }
}
