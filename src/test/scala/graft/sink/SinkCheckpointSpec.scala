package graft.sink

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSuite
import graft.types.KustoTypes

/** Sink metadata-plane cost contract: a fresh table handle rebuilds its live
  * state — INCLUDING per-file tags (lineage + stats) — from the latest sink
  * checkpoint plus trailing commits only, never by re-parsing the whole
  * commit log. The O(n²)-over-lifetime tag rebuild was the one 100×-scale
  * flaw left in the sink plane.
  */
class SinkCheckpointSpec extends SparkSuite {

  private val schema = StructType(Seq(StructField("id", LongType)))
  private val ts     = new Timestamp(1700000000000L)

  private def publishN(t: MirrorTable, n: Int): Unit =
    (1 to n).foreach { i =>
      t.stage(s"b$i", "g0",
        spark.range(i * 10L, i * 10L + 5).toDF("id")
          .withColumn(KustoTypes.BlobPathColumn, lit(s"blob-$i"))
          .withColumn(KustoTypes.IngestTsColumn, lit(ts))
          .repartition(1))
      assert(t.publishStaged(s"b$i") == i.toLong)
    }

  test("tag rebuild opens only the latest checkpoint + trailing commits; delete stays exact") {
    val dir = tmpDir("sink-ckpt")
    val t1  = new MirrorTable(spark, dir, "t")
    t1.ensureSchema(schema, Nil) // commit 0
    publishN(t1, 25)             // commits 1..25; auto-checkpoints at v10, v20

    // cold rebuild on a FRESH handle: memos empty, counters at zero
    val t2   = new MirrorTable(spark, dir, "t")
    val live = t2.liveAdds()
    assert(live.size == 25)
    // every file's lineage tag survived the checkpoint round-trip
    assert(live.forall(_.tags.contains(MirrorTable.SourceBlobsTag)))
    // the metadata cost: ONE checkpoint load + the 5 trailing commits
    // (21..25) — not the 26 commit files on disk
    assert(t2.logReader.checkpointsLoaded.get == 1L,
      s"expected 1 checkpoint load, got ${t2.logReader.checkpointsLoaded.get}")
    assert(t2.logReader.commitFilesRead.get == 5L,
      s"expected 5 trailing commit reads, got ${t2.logReader.commitFilesRead.get}")

    // delete by a lineage published BEFORE the checkpoint: exactness needs
    // the checkpoint-carried tags — without them every file is conservatively
    // rewritten; with them only blob-3's file is touched
    val untouched = live.filter { a =>
      !a.tags(MirrorTable.SourceBlobsTag).contains("\"blob-3\"")
    }.map(_.path).toSet
    assert(untouched.size == 24)
    val before = t2.snapshot().count()
    assert(t2.deleteByLineage(Seq(("blob-3", None))) == 26L)
    assert(t2.snapshot().count() == before - 5)
    val after = t2.liveAdds().map(_.path).toSet
    assert(untouched.subsetOf(after), "a file not holding the doomed lineage was rewritten")
  }

  test("pre-upgrade checkpoints (no tags) stay safe: conservative rewrite, exact rows") {
    // simulate an old checkpoint by wiping tags from the checkpoint parquet:
    // publish past a checkpoint, then null the tags column in place
    val dir = tmpDir("sink-ckpt-old")
    val t1  = new MirrorTable(spark, dir, "t")
    t1.ensureSchema(schema, Nil)
    publishN(t1, 12) // checkpoint at v10, trailing 11..12
    val logDir = new java.io.File(s"$dir/_delta_log")
    val ckpt   = logDir.listFiles().filter(_.getName.endsWith(".checkpoint.parquet"))
    assert(ckpt.length == 1)
    val df = spark.read.parquet(ckpt.head.getAbsolutePath)
      .withColumn("add", when(col("add").isNotNull,
        col("add").withField("tags", lit(null).cast("map<string,string>"))))
    val tmp = tmpDir("sink-ckpt-rewrite")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    ckpt.head.delete()
    // drop the ChecksumFileSystem sidecar too, or the swapped bytes fail CRC
    new java.io.File(logDir, s".${ckpt.head.getName}.crc").delete()
    java.nio.file.Files.copy(part.toPath, ckpt.head.toPath)

    val t2 = new MirrorTable(spark, dir, "t")
    val live = t2.liveAdds()
    assert(live.size == 12)
    // files folded from the tag-less checkpoint have no lineage recorded …
    assert(live.count(_.tags.isEmpty) == 10)
    // … so a delete still removes exactly the right ROWS (conservative
    // rewrite of the tag-less files, filter applies row-level predicate)
    val before = t2.snapshot().count()
    t2.deleteByLineage(Seq(("blob-2", None)))
    assert(t2.snapshot().count() == before - 5)
    assert(t2.snapshot().filter(col(KustoTypes.BlobPathColumn) === "blob-2").count() == 0)
  }
}
