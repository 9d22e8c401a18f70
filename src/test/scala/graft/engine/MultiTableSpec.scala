package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.deltalog.TestDelta

/** Multi-table orchestration (MirrorOrchestration.cs Task.WhenAll analog) and
  * the bounded-parallel ingest data plane.
  */
class MultiTableSpec extends SparkSuite {

  private val idSchema = StructType(Seq(StructField("id", LongType)))

  private def snapshotIds(orch: MirrorOrchestration, table: String): Seq[Long] =
    orch.table(table).snapshot().select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("two tables mirror concurrently through ONE shared checkpoint store") {
    val srcA = new TestDelta(spark, tmpDir("src-mtA"), "mtA")
    val srcB = new TestDelta(spark, tmpDir("src-mtB"), "mtB")
    srcA.init(idSchema)
    srcB.init(idSchema)
    srcA.addCommit(spark.range(0, 5).toDF("id"))
    srcB.addCommit(spark.range(100, 110).toDF("id"))

    val shared = tmpDir("state-mt")
    val orch = new MirrorOrchestration(spark, Seq(
      MirrorConfig(srcA.dir, tmpDir("mirror-mtA"), "mtA", shared),
      MirrorConfig(srcB.dir, tmpDir("mirror-mtB"), "mtB", shared)))

    assert(orch.runOnce() >= 2)
    assert(snapshotIds(orch, "mtA") == (0L until 5L))
    assert(snapshotIds(orch, "mtB") == (100L until 110L))

    // the single index.csv carries BOTH tables' state rows
    val names = orch.checkpointStore.readAll().map(_.tableName).toSet
    assert(names == Set("mtA", "mtB"))

    // incremental round: A advances while B is idle; B's rows must survive
    // every compact() the concurrent drains issue (U4 orphan preservation)
    srcA.addCommit(spark.range(5, 8).toDF("id"))
    orch.runOnce()
    assert(snapshotIds(orch, "mtA") == (0L until 8L))
    assert(snapshotIds(orch, "mtB") == (100L until 110L))
    orch.checkpointStore.compact()
    val after = orch.checkpointStore.readAll()
    assert(after.map(_.tableName).toSet == Set("mtA", "mtB"))
    assert(snapshotIds(orch, "mtB") == (100L until 110L))

    // re-poll with nothing new: no duplicates from either table
    orch.runOnce()
    assert(snapshotIds(orch, "mtA") == (0L until 8L))
    assert(snapshotIds(orch, "mtB") == (100L until 110L))
  }

  test("one broken table does not poison the others (Task.WhenAll semantics)") {
    val good = new TestDelta(spark, tmpDir("src-ok"), "ok")
    good.init(idSchema)
    good.addCommit(spark.range(0, 7).toDF("id"))
    val shared = tmpDir("state-faulty")
    // the broken table points at a source with a corrupt commit log
    val brokenSrc = tmpDir("src-broken")
    val fs = new Path(brokenSrc).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(brokenSrc, "_delta_log"))
    val out = fs.create(new Path(brokenSrc, "_delta_log/00000000000000000000.json"), true)
    try out.write("{not json at all".getBytes) finally out.close()

    val orch = new MirrorOrchestration(spark, Seq(
      MirrorConfig(good.dir, tmpDir("mirror-ok"), "ok", shared),
      MirrorConfig(brokenSrc, tmpDir("mirror-broken"), "broken", shared)))
    // the broken table's failure surfaces AFTER every table settled — the
    // good table's drain must have completed and published
    intercept[Throwable](orch.runOnce())
    assert(snapshotIds(orch, "ok") == (0L until 7L))
    // and the shared state holds the good table's durable progress
    assert(orch.checkpointStore.readAll().exists(_.tableName == "ok"))
  }

  test("misconfigured orchestration is refused") {
    val src = new TestDelta(spark, tmpDir("src-cfg"), "cfg")
    src.init(idSchema)
    val a = MirrorConfig(src.dir, tmpDir("mirror-cfgA"), "t", tmpDir("state-cfgA"))
    intercept[IllegalArgumentException] {
      new MirrorOrchestration(spark, Seq.empty)
    }
    intercept[IllegalArgumentException] { // duplicate table names
      new MirrorOrchestration(spark, Seq(a, a.copy(mirrorDir = tmpDir("mirror-cfgB"))))
    }
    intercept[IllegalArgumentException] { // split checkpoint stores
      new MirrorOrchestration(spark, Seq(a,
        a.copy(mirrorTableName = "u", mirrorDir = tmpDir("mirror-cfgC"),
          checkpointDir = tmpDir("state-cfgC"))))
    }
  }

  test("50 partition groups stage bounded-parallel into ONE publish commit") {
    val src = new TestDelta(spark, tmpDir("src-many"), "many")
    val schema = StructType(Seq(StructField("id", LongType), StructField("p", IntegerType)))
    src.init(schema, Seq("p"))
    // one source commit carrying 50 files across 50 partition tuples
    src.addCommitMulti((0 until 50).map { i =>
      (spark.range(i * 10L, i * 10L + 10L).toDF("id"), Map("p" -> i.toString))
    })
    val cfg = MirrorConfig(src.dir, tmpDir("mirror-many"), "many", tmpDir("state-many"),
      ingestParallelism = 8)
    val orch = new MirrorOrchestrator(spark, cfg)
    orch.runOnce()

    val snap = orch.table.snapshot()
    assert(snap.count() == 500)
    assert(snap.select("p").distinct().count() == 50)
    assert(snap.filter(snap("p") === 17).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (170L until 180L))

    // ONE atomic publish: the mirror log is exactly {schema commit, publish
    // commit} — 50 staged groups must not become 50 commits
    val logDir = new Path(cfg.mirrorDir, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("_")).sorted.toSeq
    assert(commits.size == 2, s"expected schema+publish, got $commits")
  }

  test("delete spanning several partition groups rewrites per group, one commit") {
    val src = new TestDelta(spark, tmpDir("src-mgdel"), "mgdel")
    val schema = StructType(Seq(StructField("id", LongType), StructField("p", IntegerType)))
    src.init(schema, Seq("p"))
    val rels = src.addCommitMulti((0 until 4).map { i =>
      (spark.range(i * 10L, i * 10L + 10L).toDF("id"), Map("p" -> i.toString))
    })
    val cfg = MirrorConfig(src.dir, tmpDir("mirror-mgdel"), "mgdel", tmpDir("state-mgdel"))
    val orch = new MirrorOrchestrator(spark, cfg)
    orch.runOnce()
    assert(orch.table.snapshot().count() == 40)
    val publishedCommits = {
      val logDir = new Path(cfg.mirrorDir, "_delta_log")
      val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(logDir).count(s => s.getPath.getName.endsWith(".json"))
    }

    // upstream deletes one row from partitions 1 and 3 in a single commit
    src.writer.commit(Seq(
      src.writer.removeAction(rels(1), Some(Map("p" -> "1"))),
      src.writer.removeAction(rels(3), Some(Map("p" -> "3")))))
    src.addCommitMulti(Seq(
      (spark.range(11L, 20L).toDF("id"), Map("p" -> "1")),   // dropped id 10
      (spark.range(31L, 40L).toDF("id"), Map("p" -> "3")))) // dropped id 30
    orch.runOnce()

    val snap = orch.table.snapshot()
    assert(snap.count() == 38)
    assert(snap.filter(snap("id").isin(10L, 30L)).count() == 0)
    assert(snap.filter(snap("p") === 1).count() == 9)
    assert(snap.filter(snap("p") === 0).count() == 10)
    // lineage delete still produced exactly one commit (remove+rewrite pairs
    // for both groups batched together)
    val logDir = new Path(cfg.mirrorDir, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(logDir).count(s => s.getPath.getName.endsWith(".json"))
    // publish of the two replacement files + one delete commit
    assert(total == publishedCommits + 2, s"expected +2 commits, got $total vs $publishedCommits")
  }
}
