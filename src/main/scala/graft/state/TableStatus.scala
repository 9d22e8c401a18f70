package graft.state

import org.apache.spark.sql.types.StructType

import graft.txlog._

/** Pure queries over one mirror table's checkpoint-state rows.
  *
  * Reference: Storage/TableStatus.cs (P1-P5, W2, W4, A7).
  */
final case class TableStatus(tableName: String, items: Seq[TransactionItem]) {

  private def isTerminal(s: TxState): Boolean = s == TxState.Done || s == TxState.Skipped

  /** P1: any item not Done/Skipped (TableStatus.cs:38-48, :131-135). */
  def isBatchIncomplete: Boolean = items.exists(i => !isTerminal(i.state))

  /** P2/A7: earliest StartTxId among incomplete items (TableStatus.cs:50-57). */
  def earliestIncompleteBatchTxId: Option[Long] =
    items.filter(i => !isTerminal(i.state)).map(_.startTxId).minOption

  /** P3: all items of the batch starting at `startTxId` (TableStatus.cs:79-85). */
  def getBatch(startTxId: Long): TxLog =
    TxLog(items.filter(_.startTxId == startTxId))

  /** P4/W2: all batches fully before `beforeTxId`, folded in tx order into the
    * applied cumulative state (TableStatus.cs:87-97). The fold's
    * add⋉remove annihilation makes `adds` exactly the live mirrored files.
    */
  def getHistorical(beforeTxId: Long): Option[TxLog] = {
    val logs = items
      .filter(_.endTxId < beforeTxId)
      .groupBy(_.startTxId)
      .toSeq
      .sortBy(_._1)
      .map { case (_, batch) => TxLog(batch) }
    if (logs.isEmpty) None else Some(TxLog.coalesce(logs))
  }

  /** P5/W4 (arg_max): latest Schema item with StartTxId ≤ `maxTxId`
    * (TableStatus.cs:99-117), materialized as a Spark schema.
    */
  def getTableDefinition(maxTxId: Long): Option[(StructType, Seq[String])] =
    items
      .filter(i => i.action == TxAction.Schema && i.startTxId <= maxTxId)
      .maxByOption(_.startTxId)
      .map { m =>
        (graft.types.KustoTypes.structFrom(m.schema.getOrElse(Seq.empty)),
          m.partitionColumns.getOrElse(Seq.empty))
      }
}

object TableStatus {
  def fromStore(store: CheckpointStore, tableName: String): TableStatus =
    // per-table read: O(this table's live rows), not O(whole shared store) —
    // the multi-table mode shares one store and a poll must not pay for the
    // other tables' accumulated history (round-15, BENCH_META_STEADY4M note)
    TableStatus(tableName, store.readTable(tableName))
}
