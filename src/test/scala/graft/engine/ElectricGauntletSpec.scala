package graft.engine

import java.time.Instant

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.deltalog.TestDelta
import graft.state.CheckpointStore
import graft.txlog.{TxAction, TxState}

/** The reference's Electric golden-count gauntlet, reproduced synthetically.
  *
  * The reference's only quantitative E2E oracle drives a ~470k-row,
  * 6-column vehicle-registration table through load → OPTIMIZE churn →
  * partitioned delete → goBack skip → delete-of-skipped no-op, asserting
  * exact counts at each stage (LoadTest.cs:26,46,69,87; DeleteTest.cs:28,
  * 51,77-78,105-106). Its CSV is LFS-absent, so the fixture regenerates
  * the SHAPE deterministically: same schema (StraightLoad.py:8-14), same
  * pinned counts — 467,855 total; 3 rows of ModelYear 1994; 710 rows
  * sharing Vin '1N4AZ0CP6E' in 2014 (DeleteWithPartition.py:9); 32,004 /
  * 29,068 / 791 rows in 2020 / 2021 / 2022 (DeleteTest.cs:77-78) — with
  * filler years sized to close the total.
  */
class ElectricGauntletSpec extends SparkSuite {

  private val TotalRows    = 467855L
  private val DeleteVin    = "1N4AZ0CP6E"
  private val VinDupes     = 710L // TotalRows - DeleteTest.cs:28's 467,145
  private val YearCounts: Seq[(Int, Long)] = Seq(
    1994 -> 3L,
    2010 -> 40000L, 2011 -> 40000L, 2012 -> 40000L, 2013 -> 40000L,
    2014 -> 45989L, 2015 -> 40000L, 2016 -> 40000L, 2017 -> 40000L,
    2018 -> 40000L, 2019 -> 40000L,
    2020 -> 32004L, 2021 -> 29068L, 2022 -> 791L)
  require(YearCounts.map(_._2).sum == TotalRows)

  private val partitionedSchema = StructType(Seq(
    StructField("VehicleType", StringType), StructField("Vin", StringType),
    StructField("Make", StringType), StructField("Model", StringType),
    StructField("NewUsed", StringType), StructField("ModelYear", IntegerType)))
  private val flatSchema = StructType(partitionedSchema.fields.filterNot(_.name == "ModelYear") :+
    StructField("ModelYear", IntegerType))

  /** One year's rows, deterministic. The 710 duplicate-VIN rows the
    * partitioned delete targets live at the head of 2014. `withYear`
    * includes ModelYear as a data column (StraightLoad); the partitioned
    * fixture leaves it to constant injection from partitionValues.
    */
  private def yearDf(year: Int, n: Long, withYear: Boolean): DataFrame = {
    val base = spark.range(n).select(
      lit("Passenger").as("VehicleType"),
      when(lit(year === 2014) && col("id") < VinDupes, lit(DeleteVin))
        .otherwise(concat(lit("5YJ"), lpad(col("id").cast("string"), 8, "0"), lit(year.toString)))
        .as("Vin"),
      lit("TESLA").as("Make"),
      lit("Model 3").as("Model"),
      when(col("id") % 2 === 0, "New").otherwise("Used").as("NewUsed"))
    if (withYear) base.withColumn("ModelYear", lit(year)) else base
  }

  private def setup(name: String): (TestDelta, MirrorConfig) = {
    val src = new TestDelta(spark, tmpDir(s"electric-src-$name"), name)
    (src, MirrorConfig(
      deltaTableUrl = src.dir,
      mirrorDir = tmpDir(s"electric-mirror-$name"),
      mirrorTableName = name,
      checkpointDir = tmpDir(s"electric-state-$name")))
  }

  /** PartitionLoad.py: one commit, one file per ModelYear partition. */
  private def partitionLoad(src: TestDelta): Map[Int, String] = {
    src.init(partitionedSchema, Seq("ModelYear"))
    val rels = src.addCommitMulti(YearCounts.map { case (y, n) =>
      (yearDf(y, n, withYear = false), Map("ModelYear" -> y.toString))
    })
    YearCounts.map(_._1).zip(rels).toMap
  }

  private def count(orch: MirrorOrchestrator): Long = orch.table.snapshot().count()

  test("StraightLoad + OPTIMIZE churn between mirrors keep 467,855 (LoadTest.cs:26,69)") {
    val (src, cfg) = setup("straight")
    src.init(flatSchema)
    // two files so the upstream OPTIMIZE has something to compact
    val halves = Seq(YearCounts.take(7), YearCounts.drop(7)).map(ys =>
      ys.map { case (y, n) => yearDf(y, n, withYear = true) }.reduce(_ unionAll _))
    val rels = src.addCommitMulti(halves.map(df => (df, Map.empty[String, String])))
    val orch = new MirrorOrchestrator(spark, cfg)
    orch.runOnce()
    assert(count(orch) == TotalRows) // LoadTest.cs:26

    // Optimize.py between mirrors: ONE commit replacing both files with the
    // compacted whole (LoadTest.cs StraightLoadOptimizeTwoShots)
    val (compacted, n) = src.writeFile(halves.reduce(_ unionAll _))
    val fs = new org.apache.hadoop.fs.Path(src.dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    src.writer.commit(
      rels.map(r => src.writer.removeAction(r)) :+
        src.writer.addAction(compacted,
          fs.getFileStatus(new org.apache.hadoop.fs.Path(src.dir, compacted)).getLen,
          Map.empty, Some(n)))
    orch.runOnce()
    assert(count(orch) == TotalRows) // LoadTest.cs:69 — churn, same rows
  }

  test("PartitionLoad counts + partitioned delete to 467,145 (LoadTest.cs:87; DeleteTest.cs:51)") {
    val (src, cfg) = setup("partdel")
    val files = partitionLoad(src)
    val orch = new MirrorOrchestrator(spark, cfg)
    orch.runOnce()
    assert(count(orch) == TotalRows)
    val snap = orch.table.snapshot()
    assert(snap.filter(snap("ModelYear") === 1994).count() == 3L) // LoadTest.cs:87
    assert(snap.schema("ModelYear").dataType == IntegerType)

    // DeleteWithPartition.py: rewrite ONLY the 2014 file without the
    // duplicate-VIN rows (Delta DELETE = remove + add in one commit)
    val kept = yearDf(2014, YearCounts.toMap.apply(2014), withYear = false)
      .filter(col("Vin") =!= DeleteVin)
    src.replaceCommit(files(2014), kept, Map("ModelYear" -> "2014"))
    orch.runOnce()
    assert(count(orch) == TotalRows - VinDupes) // DeleteTest.cs:51 — 467,145
    val snap2 = orch.table.snapshot()
    assert(snap2.filter(snap2("Vin") === DeleteVin).count() == 0L)
  }

  test("goBack 2020 loads 61,863 then DeleteYear2020 drops to 29,859 (DeleteTest.cs:77-78)") {
    val (src, cfgBase) = setup("goback2020")
    val files = partitionLoad(src)
    val cfg = cfgBase.copy(
      creationTimeExpr = Some("todatetime(strcat(p0,'-01-01'))"), // the reference default
      goBack = Some(Instant.parse("2020-01-01T00:00:00Z")))
    val orch = new MirrorOrchestrator(spark, cfg)
    orch.runOnce()
    assert(count(orch) == 32004L + 29068L + 791L) // DeleteTest.cs:77 — 61,863

    // DeleteYear2020.py: whole-partition delete — remove, no rewrite
    src.removeCommit(files(2020), Some(Map("ModelYear" -> "2020")))
    orch.runOnce()
    assert(count(orch) == 29068L + 791L) // DeleteTest.cs:78 — 29,859
  }

  test("goBack 2021 skips 2020; deleting the skipped partition is a no-op (DeleteTest.cs:105-106)") {
    val (src, cfgBase) = setup("goback2021")
    val files = partitionLoad(src)
    val cfg = cfgBase.copy(
      creationTimeExpr = Some("todatetime(strcat(p0,'-01-01'))"),
      goBack = Some(Instant.parse("2021-01-01T00:00:00Z")))
    val orch = new MirrorOrchestrator(spark, cfg)
    orch.runOnce()
    assert(count(orch) == 29068L + 791L) // DeleteTest.cs:105 — 29,859

    src.removeCommit(files(2020), Some(Map("ModelYear" -> "2020")))
    orch.runOnce()
    assert(count(orch) == 29068L + 791L) // DeleteTest.cs:106 — unchanged
    // the remove resolved against a Skipped add → Skipped, not an error
    val state = new CheckpointStore(spark, cfg.checkpointDir).readAll()
    val rm = state.filter(i => i.action == TxAction.Remove && i.blobPath.contains(files(2020)))
    assert(rm.nonEmpty && rm.forall(_.state == TxState.Skipped))
  }
}
