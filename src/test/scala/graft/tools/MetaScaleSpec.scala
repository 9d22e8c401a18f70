package graft.tools

import graft.SparkSuite
import graft.deltalog.DeltaLogReader
import graft.engine.{MirrorConfig, MirrorOrchestrator}

/** Guards the metadata-plane scale harness (MetaScale) at unit size, and
  * pins the protocol-gate refusal on the CHECKPOINT-BOOTSTRAP path — the
  * r11 verdict's loudness ask: a modern Delta table (reader v3: deletion
  * vectors, column mapping) opened via its checkpoint must refuse with the
  * named message, never present as an empty/partial mirror. The commit-JSON
  * path is pinned in DeltaLogReaderSpec ("protocol gate"); real v3 tables
  * restate the protocol in the checkpoint, which is exactly where a
  * log-retention-cleaned table (zero commit JSONs) delivers it.
  */
class MetaScaleSpec extends SparkSuite {

  test("synthetic checkpoint log bootstraps: counts, trailing commits, multi-part form") {
    val dir = tmpDir("metascale")
    MetaScale.writeSyntheticLog(spark, dir, n = 500, trailingCommits = 2, addsPerCommit = 20)
    val reader = new DeltaLogReader(spark, dir, "ms")
    val snap = reader.fullSnapshot().get
    assert(snap.adds.size == 500 + 2 * 20)
    assert(snap.metadata.nonEmpty, "metaData row survives the checkpoint")
    assert(snap.adds.forall(_.recordCount.nonEmpty), "stats parsed")
    // incremental-poll delta against a 90%-applied state
    val prev = graft.txlog.TxLog(None, None, snap.adds.take(486), Nil)
    val d = snap.delta(prev).get
    assert(d.adds.size == snap.adds.size - 486)
  }

  test("protocol gate is LOUD on the checkpoint-bootstrap path (reader v3 refused)") {
    val dir = tmpDir("metascale")
    MetaScale.writeSyntheticLog(spark, dir, n = 50, trailingCommits = 0, addsPerCommit = 0,
      minReaderVersion = 3)
    val reader = new DeltaLogReader(spark, dir, "v3table")
    val e = intercept[Exception](reader.fullSnapshot())
    assert(e.getMessage.contains("Unsupported Delta protocol"), e.getMessage)
    assert(e.getMessage.contains("minReaderVersion=3"), e.getMessage)
    // the poll path (nextBatch from cold) must refuse identically — not
    // return None/empty and let the orchestrator mirror nothing silently
    val e2 = intercept[Exception](reader.nextBatch(None))
    assert(e2.getMessage.contains("minReaderVersion=3"), e2.getMessage)
  }

  test("E2E blob table mirrors exactly (unit size)") {
    val dir = tmpDir("metascale")
    MetaScale.writeBlobTable(spark, s"$dir/t", 40)
    val cfg = MirrorConfig(
      deltaTableUrl = s"$dir/t", mirrorDir = s"$dir/m",
      mirrorTableName = "ms_e2e", checkpointDir = s"$dir/s")
    val orch = new MirrorOrchestrator(spark, cfg)
    assert(orch.runOnce() >= 1)
    assert(orch.table.snapshot().count() == 400L)
  }
}
