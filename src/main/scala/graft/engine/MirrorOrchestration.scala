package graft.engine

import org.apache.spark.sql.SparkSession

import graft.sink.MirrorTable
import graft.state.CheckpointStore
import graft.util.BoundedPar

/** Multi-table mirroring: one [[MirrorOrchestrator]] per table, drained
  * CONCURRENTLY over ONE shared checkpoint store — the Spark restatement of
  * the reference's `MirrorOrchestration.RunAsync` `Task.WhenAll` over per-
  * table orchestrations (Orchestrations/MirrorOrchestration.cs:127-132),
  * with tables sharing a single status blob per database
  * (MirrorOrchestration.cs:44-52) and per-table isolation coming from the
  * state filter (GlobalTableStatus.cs:21-23 — here
  * `TableStatus.fromStore(store, tableName)`).
  *
  * State-plane concurrency is safe because [[CheckpointStore]] serializes its
  * read-modify-write appends/compacts per index file; `compact()` is
  * table-agnostic (U4), so one table compacting never drops another table's
  * rows. Data planes never intersect: each table owns its mirror dir.
  */
class MirrorOrchestration(spark: SparkSession, configs: Seq[MirrorConfig]) {
  require(configs.nonEmpty, "need at least one table config")
  require(configs.map(_.checkpointDir).distinct.sizeIs == 1,
    "all tables of one orchestration share one checkpoint store (per-database status)")
  require(configs.map(_.mirrorTableName).distinct.size == configs.size,
    "mirror table names must be unique within the shared checkpoint store")
  require(configs.map(_.mirrorDir).distinct.size == configs.size,
    "each table needs its own mirror directory")

  private val store = new CheckpointStore(spark, configs.head.checkpointDir)
  private val orchestrators: Seq[(MirrorConfig, MirrorOrchestrator)] =
    configs.map(c => c -> new MirrorOrchestrator(spark, c, Some(store)))

  /** One concurrent poll of every table; returns total batches processed. */
  def runOnce(): Int =
    BoundedPar.run(orchestrators, orchestrators.size) { case (_, o) => o.runOnce() }.sum

  /** Drain every table concurrently until `until` (per-table continuous loops
    * inside — the `Task.WhenAll` shape). One-shot by default.
    */
  def run(until: () => Boolean = () => !configs.exists(_.continuous)): Unit = {
    BoundedPar.run(orchestrators, orchestrators.size) { case (_, o) => o.run(until) }
    ()
  }

  def table(name: String): MirrorTable =
    orchestrators.collectFirst { case (c, o) if c.mirrorTableName == name => o.table }
      .getOrElse(throw new NoSuchElementException(s"No table named $name"))

  def checkpointStore: CheckpointStore = store
}
