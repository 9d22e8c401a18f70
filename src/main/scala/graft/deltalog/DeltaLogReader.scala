package graft.deltalog

import java.time.Instant

import scala.util.matching.Regex

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.txlog._

/** `_last_checkpoint` pointer: `{version, size}`
  * (DeltaTableGateway.cs:20-26, :264-283).
  */
final case class LastCheckpoint(version: Long, size: Long)

/** Reads a Delta Lake transaction log without delta-spark: JSON commits via
  * `spark.read.json` with an explicit action schema, parquet checkpoints via
  * `spark.read.parquet` (Spark decodes the nested add/remove/metaData structs
  * natively — the reference hand-rolls repetition-level decoding,
  * TransactionLogEntry.cs:365-554; we get S5 for free).
  *
  * Scale posture: all commit files of one poll are read in ONE Spark job
  * (`json(paths:_*)`), not one job per blob; the checkpoint parquet scan is
  * distributed. Only file-level *metadata* (one small item per data file) is
  * collected to the driver — O(files), never O(rows).
  *
  * Reference: Storage/DeltaLake/DeltaTableGateway.cs (S1-S5, O1, W5),
  * TransactionLogEntry.cs:123-172 (JSON parse), :278-315 (schema extraction).
  */
class DeltaLogReader(
    spark: SparkSession,
    tablePath: String,
    mirrorTableName: String,
    readAhead: Int = DeltaLogReader.DefaultReadAhead
) {
  import DeltaLogReader._

  private val logPath = new Path(tablePath, "_delta_log")
  private def fs: FileSystem =
    logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Test-visible I/O accounting: commit files parsed / checkpoints loaded by
    * this reader instance — lets tests pin the metadata cost of rebuild paths
    * (e.g. "a fresh snapshot opens only the checkpoint + trailing commits").
    */
  private[graft] val commitFilesRead   = new java.util.concurrent.atomic.AtomicLong
  private[graft] val checkpointsLoaded = new java.util.concurrent.atomic.AtomicLong

  /** S1/S2: list commit blobs, optionally bounded, in tx order. */
  def listCommits(fromTxId: Long = 0L, toTxId: Long = Long.MaxValue): Seq[(Long, Path)] = {
    if (!fs.exists(logPath)) return Seq.empty
    fs.listStatus(logPath)
      .iterator
      .flatMap { st =>
        st.getPath.getName match {
          case CommitFileRe(digits) => Some(digits.toLong -> st.getPath)
          case _                    => None
        }
      }
      .filter { case (tx, _) => tx >= fromTxId && tx <= toTxId }
      .toSeq
      .sortBy(_._1)
  }

  /** S4: `_last_checkpoint` pointer (driver-side — a few bytes). */
  def readLastCheckpoint(): Option[LastCheckpoint] = {
    val p = new Path(logPath, "_last_checkpoint")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val node = Mapper.readTree(in)
        Some(LastCheckpoint(node.get("version").asLong, node.get("size").asLong))
      } finally in.close()
    }
  }

  /** S3: read a *set* of commit blobs in one Spark job and return one TxLog
    * per commit, in tx order.
    */
  def readCommits(commits: Seq[(Long, Path)]): Seq[TxLog] = {
    if (commits.isEmpty) return Seq.empty
    commitFilesRead.addAndGet(commits.size)
    val byPath = commits.map { case (tx, p) => p.toUri.toString -> tx }.toMap
    val rows = spark.read
      .schema(ActionSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(commits.map(_._2.toUri.toString): _*)
      .withColumn("_file", input_file_name())
      .collect()

    // a malformed commit line must fail LOUDLY: with an explicit schema it
    // would otherwise parse to an all-null row, be dropped as "no engine
    // actions", and silently present the table as empty/behind — the same
    // failure class as a log gap
    rows.find(r => r.getAs[String]("_corrupt") != null).foreach { r =>
      throw new IllegalStateException(
        s"Corrupt Delta commit JSON in ${r.getAs[String]("_file")} for table " +
          s"$mirrorTableName: '${r.getAs[String]("_corrupt").take(120)}' — refusing to read")
    }
    // the other torn-write shape: a commit file that parses to ZERO rows
    // (zero bytes, or whitespace-only — the JSON source drops blank lines
    // without marking them corrupt). A valid commit always yields ≥1 row
    // (even commitInfo/txn-only lines parse to an all-null-action row).
    val rowTxs = rows.map(r =>
      byPath.getOrElse(r.getAs[String]("_file"),
        extractTxId(new Path(r.getAs[String]("_file")).getName).getOrElse(-1L))).toSet
    commits.find { case (tx, _) => !rowTxs.contains(tx) }.foreach { case (tx, p) =>
      throw new IllegalStateException(
        s"Commit file $p of table $mirrorTableName (tx $tx) contains no JSON records " +
          "(torn write?) — refusing to read")
    }

    val grouped = rows.toSeq.groupBy { r =>
      byPath.getOrElse(
        r.getAs[String]("_file"),
        // input_file_name may differ in URI normalization; fall back on tx-id parse
        extractTxId(new Path(r.getAs[String]("_file")).getName)
          .getOrElse(sys.error(s"Unexpected commit file ${r.getAs[String]("_file")}")))
    }
    // commits whose actions are all non-engine (commitInfo/txn only) fold to
    // zero items and are skipped; the tx range still advances past them when
    // a later non-empty commit lands in the same batch.
    commits.flatMap { case (tx, _) =>
      val items = grouped.getOrElse(tx, Seq.empty).flatMap(rowToItem(_, tx, tx))
      if (items.isEmpty) None else Some(TxLog(items))
    }
  }

  /** S5/O1: read a `<v>.checkpoint.parquet` (possibly multi-part) into one
    * cumulative TxLog with the given tx range.
    */
  def readCheckpoint(version: Long, startTxId: Long): TxLog = {
    checkpointsLoaded.incrementAndGet()
    val prefix = f"$version%020d.checkpoint"
    val names = fs
      .listStatus(logPath)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith(prefix) && n.endsWith(".parquet")
      }
      .sortBy(_.getName)
    require(names.nonEmpty, s"Checkpoint parquet missing for version $version under $logPath")

    // multi-part integrity: the file name encodes <i>.<n>; a crash between
    // the delete-then-rename steps of a re-checkpoint (or a concurrent poll)
    // can expose a subset — reading it silently would drop add actions, so
    // validate the set is complete and not mixed with the single-file form
    val MultiPart = raw"\d{20}\.checkpoint\.(\d{10})\.(\d{10})\.parquet".r
    val parts     = names.map(_.getName).collect { case MultiPart(i, n) => (i.toInt, n.toInt) }
    if (parts.nonEmpty) {
      val declared = parts.map(_._2).distinct
      val indices  = parts.map(_._1).sorted.toSeq
      // the indices must be EXACTLY 1..n — a count-only check passes mixed
      // sets like {single-file form, part 2/3, part 3/3} (3 files, n=3),
      // which double-counts or drops actions; and no single-file-form name
      // may coexist with multi-part names (names.length == parts.length)
      require(declared.size == 1 && names.length == parts.length &&
        indices == (1 to declared.head),
        s"Incomplete or mixed checkpoint for version $version: found ${names.length} " +
          s"file(s) ${names.map(_.getName).mkString(", ")} but part names declare " +
          s"${declared.mkString("/")} parts with indices ${indices.mkString(",")}")
    }

    val df   = spark.read.parquet(names.map(_.toUri.toString).toIndexedSeq: _*)
    val cols = df.columns.toSet
    // include `protocol`: real Delta checkpoints embed the protocol action
    // and later commits don't restate it — selecting it keeps rowToItem's
    // minReaderVersion gate effective on the checkpoint-bootstrap path too
    val wanted = Seq("metaData", "add", "remove", "protocol").filter(cols)
    val rows = df.select(wanted.map(col): _*).collect()
    TxLog(rows.toSeq.flatMap(rowToItem(_, startTxId, version)))
  }

  /** The scan planner (DeltaTableGateway.cs:71-122 / SURVEY §3.3): compute
    * the next coalesced batch of work given the already-applied state.
    *
    *   - If a Delta checkpoint exists and the applied state is ≥ 2 commits
    *     behind it, bootstrap from the checkpoint (log-skipping, O1) and
    *     diff against the applied state (`TxLog.delta`, J2), then fold in up
    *     to `readAhead` commits past the checkpoint (W5).
    *   - Otherwise replay at most `readAhead` new commit files and fold them
    *     (`TxLog.coalesce`, J1/U2).
    */
  def nextBatch(current: Option[TxLog]): Option[TxLog] = {
    val fromTxId = current.map(_.endTxId + 1).getOrElse(0L)
    readLastCheckpoint() match {
      case Some(ckpt) if fromTxId < ckpt.version =>
        val cumulative = readCheckpoint(ckpt.version, startTxId = fromTxId)
        val deltaLog = current match {
          case Some(c) => cumulative.delta(c)
          case None    => Some(cumulative)
        }
        val after = readCommits(
          checkContiguous(listCommits(ckpt.version + 1, ckpt.version + readAhead), ckpt.version + 1))
        val logs = deltaLog.toSeq ++ after
        if (logs.isEmpty) None else Some(TxLog.coalesce(logs))
      case _ =>
        val commits = checkContiguous(
          listCommits(fromTxId, fromTxId + readAhead - 1), fromTxId)
        val logs = readCommits(commits)
        if (logs.isEmpty) None
        else Some(TxLog.coalesce(logs))
    }
  }

  /** The complete current state of the table: checkpoint-bootstrap when one
    * exists (O1), else full commit replay. Unlike [[nextBatch]] there is no
    * read-ahead cap — this is the "open the table" path, not the poll path.
    *
    * A log with a checkpoint but ZERO commit JSONs (real Delta log-retention
    * cleanup leaves exactly this) is NOT empty: fall back to the
    * `_last_checkpoint` state instead of returning None.
    */
  def fullSnapshot(): Option[TxLog] =
    listCommits().lastOption match {
      case Some((last, _)) => snapshotAsOf(last)
      case None =>
        readLastCheckpoint().map(c => readCheckpoint(c.version, startTxId = 0L))
    }

  /** Table state as of commit `version` (inclusive) — time travel, and the
    * shared fold under [[fullSnapshot]]. Bootstraps from the NEWEST on-disk
    * checkpoint at or before `version` (older checkpoints are never deleted,
    * so travel below the latest checkpoint stays O(recent), not O(full log)).
    * Returns None when the log is empty. Throws on a version beyond the
    * latest commit — silently returning the current state would let the same
    * version argument mean different data over time (Delta's versionAsOf
    * errors the same way).
    */
  def snapshotAsOf(version: Long): Option[TxLog] = {
    val commits = listCommits()
    if (commits.isEmpty) return None
    val last = commits.last._1
    require(version >= 0 && version <= last,
      s"Version $version is out of range: table $mirrorTableName has commits 0..$last")
    // newest usable checkpoint first; a torn multi-part set (crash between
    // the rename steps of a re-checkpoint) is skipped in favor of an older
    // checkpoint or full replay — commits are never deleted, so the fold
    // stays correct, only slower
    val fromCheckpoint = checkpointVersions().filter(_ <= version).sorted.reverse.view
      .flatMap { ckptV =>
        try {
          val cumulative = readCheckpoint(ckptV, startTxId = 0L)
          // filter the in-hand listing instead of re-LISTing the log dir —
          // directory LIST is the dominant metadata cost on object stores
          val after = readCommits(
            checkContiguous(commits.filter(_._1 > ckptV), ckptV + 1).filter(_._1 <= version))
          Some(TxLog.coalesce(cumulative +: after))
        } catch {
          case e: IllegalArgumentException
              if Option(e.getMessage).exists(_.contains("Incomplete or mixed checkpoint")) =>
            None
        }
      }
      .headOption
    fromCheckpoint.orElse {
      val logs = readCommits(checkContiguous(commits.filter(_._1 <= version), 0L))
      if (logs.isEmpty) None else Some(TxLog.coalesce(logs))
    }
  }

  /** Versions with a (single- or multi-part) checkpoint parquet on disk. */
  private def checkpointVersions(): Seq[Long] = {
    val Ckpt = raw"(\d{20})\.checkpoint(\.\d{10}\.\d{10})?\.parquet".r
    if (!fs.exists(logPath)) return Seq.empty
    fs.listStatus(logPath).toSeq
      .map(_.getPath.getName)
      .collect { case Ckpt(v, _) => v.toLong }
      .distinct
      .sorted
  }

  /** A vacuumed/gappy log means unrecoverable history — fail loudly rather
    * than silently skipping commits. (Gaps *above* `from` are impossible in a
    * healthy Delta log; a missing head means the state references vacuumed
    * commits.)
    */
  private def checkContiguous(commits: Seq[(Long, Path)], from: Long): Seq[(Long, Path)] = {
    commits.headOption.foreach { case (tx, _) =>
      require(tx == from, s"Delta log gap: expected commit $from, found $tx")
    }
    // (an empty list is trivially contiguous)
    commits.zipWithIndex.foreach { case ((tx, _), i) =>
      require(tx == from + i, s"Delta log gap at commit ${from + i} (found $tx)")
    }
    commits
  }

  // ---- row → item mapping -------------------------------------------------

  private def rowToItem(row: Row, startTxId: Long, endTxId: Long): Seq[TransactionItem] = {
    val now = Instant.now()
    val out = Seq.newBuilder[TransactionItem]

    def structOpt(name: String): Option[Row] =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
        Some(row.getAs[Row](name))
      else None

    // protocol gate: reader version 1 is the classic parquet protocol this
    // engine implements; higher versions introduce features (deletion
    // vectors, column mapping) that change what the data files MEAN — reading
    // on regardless would silently resurrect deleted rows. Fail loudly, the
    // same stance as the reference's parquet-only format check.
    structOpt("protocol").foreach { p =>
      val minReader = Option(p.getAs[java.lang.Integer]("minReaderVersion")).fold(1)(_.intValue)
      require(minReader <= 1,
        s"Unsupported Delta protocol: minReaderVersion=$minReader (this reader implements version 1; " +
          "newer reader features like deletion vectors or column mapping would be silently misread)")
    }

    structOpt("metaData").foreach { m =>
      val format = Option(m.getAs[Row]("format"))
      val provider = format.map(_.getAs[String]("provider")).orNull
      require(
        provider == null || provider.equalsIgnoreCase("parquet"),
        s"Only parquet-format Delta tables are supported, got '$provider'")
      val schemaString = m.getAs[String]("schemaString")
      val schema       = DataType.fromJson(schemaString).asInstanceOf[StructType]
      val pcols =
        Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
          .map(_.toList).getOrElse(Nil)
      out += TransactionItem(
        tableName = mirrorTableName,
        startTxId = startTxId,
        endTxId = endTxId,
        action = TxAction.Schema,
        state = TxState.Initial,
        mirrorTimestamp = now,
        deltaTimestamp = Option(m.getAs[java.lang.Long]("createdTime")).map(t => Instant.ofEpochMilli(t)),
        partitionColumns = Some(pcols),
        schema = Some(schema.fields.toSeq.map(f => ColumnSpec(f.name, f.dataType.sql))),
        internalState = InternalState(
          deltaTableId = Option(m.getAs[String]("id")),
          deltaTableName = Option(m.getAs[String]("name")))
      )
    }

    structOpt("add").foreach { a =>
      out += TransactionItem(
        tableName = mirrorTableName,
        startTxId = startTxId,
        endTxId = endTxId,
        action = TxAction.Add,
        state = TxState.Initial,
        mirrorTimestamp = now,
        deltaTimestamp =
          Option(a.getAs[java.lang.Long]("modificationTime")).map(t => Instant.ofEpochMilli(t)),
        blobPath = Option(a.getAs[String]("path")),
        partitionValues =
          Option(a.getAs[scala.collection.Map[String, String]]("partitionValues")).map(_.toMap),
        size = Option(a.getAs[java.lang.Long]("size")).map(_.longValue),
        recordCount = Option(a.getAs[String]("stats")).flatMap(parseNumRecords),
        tags =
          if (a.schema.fieldNames.contains("tags"))
            Option(a.getAs[scala.collection.Map[String, String]]("tags")).map(_.toMap)
          else None
      )
    }

    structOpt("remove").foreach { r =>
      out += TransactionItem(
        tableName = mirrorTableName,
        startTxId = startTxId,
        endTxId = endTxId,
        action = TxAction.Remove,
        state = TxState.Initial,
        mirrorTimestamp = now,
        deltaTimestamp =
          Option(r.getAs[java.lang.Long]("deletionTimestamp")).map(t => Instant.ofEpochMilli(t)),
        blobPath = Option(r.getAs[String]("path")),
        // Synapse sometimes omits partition values on remove — keep nullable
        // (TransactionItem.cs:305-306, TransactionLogEntry.cs:257-261).
        partitionValues =
          Option(r.getAs[scala.collection.Map[String, String]]("partitionValues")).map(_.toMap),
        size = Option(r.getAs[java.lang.Long]("size")).map(_.longValue)
      )
    }
    out.result()
  }

  private def parseNumRecords(stats: String): Option[Long] =
    try {
      Option(Mapper.readTree(stats).get("numRecords")).map(_.asLong)
    } catch { case _: Exception => None }
}

object DeltaLogReader {
  /** Commit read-ahead bound — 10 commits per poll, cold or past a
    * checkpoint (DeltaTableGateway.cs:87-121, W5/BASELINE).
    */
  val DefaultReadAhead = 10

  val TxIdFormat                = "%020d"
  private val CommitFileRe: Regex = """^(\d{20})\.json$""".r
  private val Mapper            = new ObjectMapper()

  def extractTxId(fileName: String): Option[Long] = fileName match {
    case CommitFileRe(d) => Some(d.toLong)
    case _               => None
  }

  /** Explicit Delta action schema (the public Delta protocol subset the
    * engine consumes — TransactionLogEntry.cs:19-120). Explicit so commit
    * reads never pay schema inference and never mis-infer empty maps.
    */
  val ActionSchema: StructType = StructType(Seq(
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType),
      StructField("tags", MapType(StringType, StringType))))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType),
      StructField("extendedFileMetadata", BooleanType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("tags", MapType(StringType, StringType))))),
    StructField("txn", StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType),
      StructField("lastUpdated", LongType)))),
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType))))
  ))
}
