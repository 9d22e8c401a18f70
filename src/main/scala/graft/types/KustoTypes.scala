package graft.types

import org.apache.spark.sql.types._

/** Spark ↔ Kusto scalar-type mapping and mirror-table schema helpers.
  *
  * Reference: Storage/DeltaLake/TransactionLogEntry.cs:317-344 (`GetKustoType`),
  * Storage/TableDefinition.cs:11-99, Storage/ColumnDefinition.cs:10-30.
  *
  * Differences from the reference, by design:
  *   - `binary` is supported (the reference errors on it, :333-334) — Spark
  *     handles `BinaryType` natively and the multimodal pipeline needs it.
  *   - nested struct/array/map columns map to Kusto `dynamic` both ways; on
  *     the Spark side they stay fully typed (the reference flattens them to
  *     `dynamic` strings because only top-level types are read, :37-42).
  */
object KustoTypes {

  /** The ONE ColumnSpec→StructType conversion (previously copy-pasted at
    * every consumer): a schema-encoding change now lands in a single place,
    * keeping time-travel, checkpoint, and current-snapshot schemas in step.
    */
  def structFrom(cols: Seq[graft.txlog.ColumnSpec]): StructType =
    StructType(cols.map(c => StructField(c.name, DataType.fromDDL(c.dataType))))

  /** Lineage column appended to every mirrored table
    * (TableDefinition.cs:16, :58-69).
    */
  val BlobPathColumn = "MLK_BlobPath"

  /** Ingest-instance column — the engine's stand-in for Kusto's
    * `ingestion_time()` (SURVEY §2.g): pins row identity so targeted deletes
    * stay exact when the same blob path is ingested twice.
    */
  val IngestTsColumn = "MLK_IngestTs"

  /** Version tag on [[graft.sink.MirrorTable.changesBetween]] CDC rows: the
    * sink-log commit that introduced the row.
    */
  val CommitVersionColumn = "MLK_CommitVersion"

  def toKustoType(dt: DataType): String = dt match {
    case StringType                       => "string"
    case LongType                         => "long"
    case DoubleType                       => "double"
    case BooleanType                      => "boolean"
    case _: DecimalType                   => "decimal"
    case IntegerType | ShortType | ByteType => "int"
    case FloatType                        => "real"
    case BinaryType                       => "string" // base64 at the Kusto edge; BinaryType in-engine
    case DateType | TimestampType | TimestampNTZType => "datetime"
    case _: StructType | _: ArrayType | _: MapType   => "dynamic"
    case other => throw new IllegalArgumentException(s"Unsupported type for mirror: $other")
  }

  def fromKustoType(kt: String): DataType = kt match {
    case "string"   => StringType
    case "long"     => LongType
    case "double"   => DoubleType
    case "boolean"  => BooleanType
    case "decimal"  => DecimalType(38, 18)
    case "int"      => IntegerType
    case "real"     => DoubleType
    case "datetime" => TimestampType
    case "dynamic"  => StringType // JSON-encoded
    case other => throw new IllegalArgumentException(s"Unknown Kusto type: $other")
  }

  /** `['col']:type, ...` DDL text (TableDefinition.cs:46-56) — kept for
    * parity tests and debuggability.
    */
  def kustoSchemaString(schema: StructType): String =
    schema.fields.map(f => s"['${f.name}']:${toKustoType(f.dataType)}").mkString(", ")

  /** Mirror-table schema = source schema + tracking columns
    * (TableDefinition.cs:58-69 `WithTrackingColumns`).
    */
  def withTrackingColumns(schema: StructType): StructType =
    StructType(
      schema.fields.toSeq :+
        StructField(BlobPathColumn, StringType, nullable = true) :+
        StructField(IngestTsColumn, TimestampType, nullable = true)
    )
}
