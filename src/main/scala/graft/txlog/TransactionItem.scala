package graft.txlog

import java.time.Instant

/** Action kind of a checkpoint-state row.
  *
  * Reference: Storage/TransactionItemAction.cs:9-15.
  */
sealed abstract class TxAction(val name: String) extends Product with Serializable
object TxAction {
  case object Schema       extends TxAction("Schema")
  case object StagingTable extends TxAction("StagingTable")
  case object Add          extends TxAction("Add")
  case object Remove       extends TxAction("Remove")

  val all: Seq[TxAction] = Seq(Schema, StagingTable, Add, Remove)
  def parse(s: String): TxAction =
    all.find(_.name == s).getOrElse(throw new IllegalArgumentException(s"Unknown TxAction: $s"))
}

/** Lifecycle state of a checkpoint-state row.
  *
  * Reference: Storage/TransactionItemState.cs:9-17 (`QueuedForIngestion` is
  * declared there but never assigned; kept for CSV-schema parity).
  */
sealed abstract class TxState(val name: String) extends Product with Serializable
object TxState {
  case object Initial            extends TxState("Initial")
  case object Analyzed           extends TxState("Analyzed")
  case object Skipped            extends TxState("Skipped")
  case object Done               extends TxState("Done")
  case object QueuedForIngestion extends TxState("QueuedForIngestion")
  case object Staged             extends TxState("Staged")

  val all: Seq[TxState] = Seq(Initial, Analyzed, Skipped, Done, QueuedForIngestion, Staged)
  def parse(s: String): TxState =
    all.find(_.name == s).getOrElse(throw new IllegalArgumentException(s"Unknown TxState: $s"))
}

/** A (name, type) column pair. The type string is a Spark DDL type name
  * (e.g. "bigint", "string") — the engine's schema IR is stringly typed like
  * the reference's (Storage/ColumnDefinition.cs:10-30) but uses Spark DDL
  * names so `StructType.fromDDL` round-trips losslessly.
  */
final case class ColumnSpec(name: String, dataType: String)

/** Per-item engine-internal state blob.
  *
  * Reference: Storage/InternalState.cs:11-18 and its three variants
  * (AddInternalState.cs, SchemaInternalState.cs, StagingTableInternalState.cs)
  * — flattened into one optional-field record since it is JSON-in-CSV anyway.
  */
final case class InternalState(
    creationTime: Option[Instant] = None,
    ingestionTime: Option[String] = None,
    stagingTableName: Option[String] = None,
    deltaTableId: Option[String] = None,
    deltaTableName: Option[String] = None
)
object InternalState { val empty: InternalState = InternalState() }

/** Last-write-wins identity of a checkpoint-state row.
  *
  * Reference: Storage/TransactionItem.cs:463-466 (`GetItemKey`).
  */
final case class ItemKey(
    tableName: String,
    startTxId: Long,
    endTxId: Long,
    action: TxAction,
    blobPath: Option[String]
)

/** One durable state row of the mirror engine — one (table, tx-range, action,
  * blob) state transition. The full CSV schema mirrors
  * Storage/TransactionItem.cs:24; nested fields are JSON-in-CSV
  * (TransactionItem.cs:55-202).
  *
  * Pure metadata: the engine never holds data rows, only file-level facts
  * (path, size, recordCount, partition values) — this is what keeps the
  * driver-side footprint bounded at 100 TB table sizes.
  */
final case class TransactionItem(
    tableName: String,
    startTxId: Long,
    endTxId: Long,
    action: TxAction,
    state: TxState,
    mirrorTimestamp: Instant,
    deltaTimestamp: Option[Instant] = None,
    blobPath: Option[String] = None,
    partitionValues: Option[Map[String, String]] = None,
    size: Option[Long] = None,
    recordCount: Option[Long] = None,
    partitionColumns: Option[Seq[String]] = None,
    schema: Option[Seq[ColumnSpec]] = None,
    internalState: InternalState = InternalState.empty,
    /** Delta add.tags (sink-plane file metadata: lineage + stats). NOT part
      * of the reference's CSV state schema (TransactionItem.cs:24) — the
      * engine-state CSV round-trip drops it by design; it persists via the
      * sink's commit JSONs and checkpoint parquet instead, so tag rebuilds
      * bootstrap from the latest checkpoint like the snapshot does.
      */
    tags: Option[Map[String, String]] = None
) {
  def itemKey: ItemKey = ItemKey(tableName, startTxId, endTxId, action, blobPath)

  def withTxRange(start: Long, end: Long): TransactionItem =
    copy(startTxId = start, endTxId = end)

  def withState(s: TxState, at: Instant): TransactionItem =
    copy(state = s, mirrorTimestamp = at)
}
