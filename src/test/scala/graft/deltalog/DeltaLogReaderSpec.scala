package graft.deltalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.txlog.{TxAction, TxState}

class DeltaLogReaderSpec extends SparkSuite {
  import spark.implicits._

  private val idSchema = StructType(Seq(StructField("id", LongType)))

  test("commit write → read round-trip: metadata, adds, stats, partition values") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "roundtrip")
    fx.init(idSchema, Seq("year"))
    val rel = fx.addCommit(spark.range(5).toDF("id"), Map("year" -> "1994"))

    val reader  = new DeltaLogReader(spark, dir, "roundtrip")
    val commits = reader.listCommits()
    assert(commits.map(_._1) == Seq(0L, 1L))
    val logs = reader.readCommits(commits)
    assert(logs.size == 2)

    val m = logs.head.metadata.get
    assert(m.schema.get.map(_.name) == Seq("id"))
    assert(m.partitionColumns.contains(Seq("year")))
    assert(m.internalState.deltaTableName.contains("roundtrip"))

    val add = logs(1).adds.head
    assert(add.blobPath.contains(rel))
    assert(add.recordCount.contains(5L))
    assert(add.partitionValues.contains(Map("year" -> "1994")))
    assert(add.size.exists(_ > 0))
    assert(add.state == TxState.Initial && add.action == TxAction.Add)
  }

  test("checkpoint parquet bootstrap (O1) folds to the live set") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "ckpt")
    fx.init(idSchema)
    val f0 = fx.addCommit(spark.range(3).toDF("id"))
    fx.addCommit(spark.range(3, 6).toDF("id"))
    fx.replaceCommit(f0, spark.range(1, 3).toDF("id")) // delete id=0
    val v = fx.checkpoint()
    assert(v == 3L)

    val reader = new DeltaLogReader(spark, dir, "ckpt")
    assert(reader.readLastCheckpoint().map(_.version).contains(3L))
    val cum = reader.readCheckpoint(3L, startTxId = 0L)
    assert(cum.metadata.nonEmpty)
    assert(cum.adds.size == 2)                 // f1 + rewritten f0'
    assert(!cum.adds.exists(_.blobPath.contains(f0)))

    // cold-start nextBatch goes through the checkpoint, not 4 commits
    val batch = reader.nextBatch(None).get
    assert(batch.adds.size == 2)
    assert(batch.endTxId == 3L)
  }

  test("multi-part checkpoint (the 100 TB form) bootstraps identically") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "ckpt_mp")
    fx.init(idSchema)
    val f0 = fx.addCommit(spark.range(3).toDF("id"))
    fx.addCommit(spark.range(3, 6).toDF("id"))
    fx.replaceCommit(f0, spark.range(1, 3).toDF("id"))
    val v = fx.checkpoint(numParts = 3)
    assert(v == 3L)

    // protocol naming: <v>.checkpoint.<i>.<n>.parquet, one file per part
    val fs    = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new Path(dir, "_delta_log")).map(_.getPath.getName)
    val partNames = names.filter(_.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
    assert(partNames.length == 3)
    assert(!names.contains(f"${3L}%020d.checkpoint.parquet"))

    val reader = new DeltaLogReader(spark, dir, "ckpt_mp")
    assert(reader.readLastCheckpoint().map(_.version).contains(3L))
    val cum = reader.readCheckpoint(3L, startTxId = 0L)
    assert(cum.metadata.nonEmpty)
    assert(cum.adds.size == 2)
    assert(!cum.adds.exists(_.blobPath.contains(f0)))
    val batch = reader.nextBatch(None).get
    assert(batch.adds.size == 2 && batch.endTxId == 3L)

    // a PARTIAL multi-part set (crash mid-rename, or a concurrent poll) must
    // be refused, not silently read as the whole table
    val firstPart = partNames.sorted.head
    val victim    = new Path(new Path(dir, "_delta_log"), firstPart)
    val bytes     = org.apache.commons.io.IOUtils.toByteArray(fs.open(victim))
    fs.delete(victim, false)
    val e = intercept[IllegalArgumentException](reader.readCheckpoint(3L, startTxId = 0L))
    assert(e.getMessage.contains("Incomplete or mixed checkpoint"), e.getMessage)
    val out = fs.create(victim, true)
    try out.write(bytes) finally out.close()

    // re-checkpointing the same version with a different part count must
    // not leave both naming forms behind (the prefix glob would then
    // double-count every action)
    assert(fx.checkpoint(numParts = 1) == 3L)
    val after = fs.listStatus(new Path(dir, "_delta_log")).map(_.getPath.getName)
      .filter(n => n.contains(".checkpoint") && n.endsWith(".parquet"))
    assert(after.toSeq == Seq(f"${3L}%020d.checkpoint.parquet"), after.toSeq)
    assert(reader.readCheckpoint(3L, startTxId = 0L).adds.size == 2)
  }

  test("mixed single-file + multi-part checkpoint set is refused") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "ckpt_mix")
    fx.init(idSchema)
    fx.addCommit(spark.range(2).toDF("id"))
    fx.addCommit(spark.range(2, 4).toDF("id"))
    assert(fx.checkpoint(numParts = 3) == 2L)
    val logDir = new Path(dir, "_delta_log")
    val fs     = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partNames = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet")).sorted
    val saved = partNames.map { n =>
      n -> org.apache.commons.io.IOUtils.toByteArray(fs.open(new Path(logDir, n)))
    }
    // re-checkpoint to the single-file form, then resurrect parts 2..3 of 3:
    // {v.checkpoint.parquet, part2/3, part3/3} = 3 files with declared n=3 —
    // a COUNT-only integrity check would read this and double-count actions
    assert(fx.checkpoint(numParts = 1) == 2L)
    saved.drop(1).foreach { case (n, bytes) =>
      val out = fs.create(new Path(logDir, n), true)
      try out.write(bytes) finally out.close()
    }
    val reader = new DeltaLogReader(spark, dir, "ckpt_mix")
    val e = intercept[IllegalArgumentException](reader.readCheckpoint(2L, startTxId = 0L))
    assert(e.getMessage.contains("Incomplete or mixed checkpoint"), e.getMessage)
  }

  test("fullSnapshot survives log-retention cleanup (checkpoint, zero commit JSONs)") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "ckpt_ret")
    fx.init(idSchema)
    fx.addCommit(spark.range(3).toDF("id"))
    fx.addCommit(spark.range(3, 5).toDF("id"))
    fx.checkpoint()
    // real Delta log retention: expired commit JSONs removed, checkpoint kept
    val logDir = new Path(dir, "_delta_log")
    val fs     = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(logDir).map(_.getPath)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .foreach(p => fs.delete(p, false))
    val reader = new DeltaLogReader(spark, dir, "ckpt_ret")
    val snap = reader.fullSnapshot()
    assert(snap.nonEmpty, "table with a checkpoint but no commit JSONs is not empty")
    assert(snap.get.adds.size == 2)
  }

  test("corrupt and zero-record commit files are refused, not read as empty") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "torn")
    fx.init(idSchema)
    fx.addCommit(spark.range(3).toDF("id"))
    val logDir = new Path(dir, "_delta_log")
    val fs     = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // malformed JSON line → corrupt-record refusal
    val badJson = new Path(logDir, f"${2L}%020d.json")
    val o1 = fs.create(badJson, true)
    try o1.write("{not json at all".getBytes) finally o1.close()
    val reader = new DeltaLogReader(spark, dir, "torn")
    val e1 = intercept[IllegalStateException](reader.nextBatch(None))
    assert(e1.getMessage.contains("Corrupt Delta commit JSON"), e1.getMessage)

    // zero-byte commit (torn write) → zero-record refusal; with an explicit
    // schema this would otherwise silently fold to "no engine actions"
    fs.delete(badJson, false)
    val o2 = fs.create(badJson, true)
    o2.close()
    val e2 = intercept[IllegalStateException](reader.nextBatch(None))
    assert(e2.getMessage.contains("contains no JSON records"), e2.getMessage)
  }

  test("gap in the commit log fails loudly") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "gap")
    fx.init(idSchema)
    fx.addCommit(spark.range(1).toDF("id"))
    fx.addCommit(spark.range(1, 2).toDF("id"))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(dir, "_delta_log/" + f"${1L}%020d" + ".json"), false))
    val reader = new DeltaLogReader(spark, dir, "gap")
    val e = intercept[IllegalArgumentException](reader.nextBatch(None))
    assert(e.getMessage.contains("gap"))
  }

  test("protocol gate: reader version 1 accepted, deletion-vector era refused") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "proto")
    fx.init(idSchema)
    val w = new DeltaLogWriter(spark, dir)
    w.commit(Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""))
    val reader = new DeltaLogReader(spark, dir, "proto")
    // v1 protocol action is benign
    reader.readCommits(reader.listCommits())

    w.commit(Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7}}"""))
    val e = intercept[Exception] {
      reader.readCommits(reader.listCommits())
    }
    assert(e.getMessage.contains("minReaderVersion=3"), e.getMessage)
  }

  test("non-parquet provider is rejected") {
    val dir = tmpDir("delta")
    val w   = new DeltaLogWriter(spark, dir)
    val bad = w.metaDataAction("id0", "bad", idSchema, Nil)
      .replace("\"provider\":\"parquet\"", "\"provider\":\"csv\"")
    w.commit(Seq(bad))
    val reader = new DeltaLogReader(spark, dir, "bad")
    val e = intercept[Exception](reader.readCommits(reader.listCommits()))
    assert(e.getMessage.contains("parquet"))
  }

  test("optimistic concurrency: losing a commit race fails, retry lands on next version") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "race")
    fx.init(idSchema)
    // simulate a concurrent writer owning version 1
    val w2 = new DeltaLogWriter(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stolen = new Path(dir, "_delta_log/" + f"${1L}%020d" + ".json")
    val out = fs.create(stolen, false)
    out.write("""{"commitInfo":{"operation":"CONCURRENT"}}""".getBytes); out.close()
    // our writer computes nextVersion=2 (sees the stolen commit) — no clash
    val v = fx.writer.commit(Seq(fx.writer.addAction("x.parquet", 1L, Map.empty, Some(1L))))
    assert(v == 2L)
    // but a rename onto an existing version must fail, not overwrite
    intercept[Exception] {
      val name = f"${2L}%020d.json"
      val tmp  = new Path(dir, s"_delta_log/.$name.tmp-test")
      val o2   = fs.create(tmp, false)
      o2.write("{}".getBytes); o2.close()
      if (!fs.rename(tmp, new Path(dir, s"_delta_log/$name")))
        throw new IllegalStateException("Commit conflict")
    }
  }

  test("commitInfo-only commits are skipped but the batch still advances") {
    val dir = tmpDir("delta")
    val fx  = new TestDelta(spark, dir, "noop")
    fx.init(idSchema)
    fx.writer.commit(Seq("""{"commitInfo":{"operation":"VACUUM START"}}"""))
    fx.addCommit(spark.range(2).toDF("id"))
    val reader = new DeltaLogReader(spark, dir, "noop")
    val batch  = reader.nextBatch(None).get
    assert(batch.adds.size == 1)
    assert(batch.startTxId == 0L && batch.endTxId == 2L)
  }
}
