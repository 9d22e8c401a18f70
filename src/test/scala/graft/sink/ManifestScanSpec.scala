package graft.sink

import org.apache.hadoop.fs.Path

import graft.SparkSuite

/** GraftManifestScan contract pins (r14 review): duplicate manifest paths
  * must read ONCE (matching the InMemoryFileIndex it replaces, which keys
  * leaf files by path), and the recorded length is trusted verbatim.
  */
class ManifestScanSpec extends SparkSuite {

  test("duplicate manifest entries for one path are read once, not twice") {
    val dir = tmpDir("manifest-dup")
    spark.range(2).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val len = fs.getFileStatus(file).getLen

    val st = org.apache.spark.sql.graftbridge.GraftManifestScan.status(file, len)
    val df = org.apache.spark.sql.graftbridge.GraftManifestScan.parquet(
      spark, spark.read.parquet(dir).schema, Seq(st, st, st))
    assert(df.count() == 2L,
      "a path listed three times in the manifest must still be scanned once")
    // contrast pin: Spark's listed read DUPLICATES repeated explicit paths
    // (each arg becomes its own scan entry) — the manifest dedup is an
    // engine-semantics guarantee (one physical blob ingests once), stronger
    // than spark.read parity
    assert(spark.read.parquet(file.toString, file.toString).count() == 4L)
  }

  test("manifest scan equals the listed read on a multi-file set") {
    val dir = tmpDir("manifest-eq")
    spark.range(100).toDF("id").repartition(4).write.mode("overwrite").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    val stats = files.map(p =>
      org.apache.spark.sql.graftbridge.GraftManifestScan.status(
        p, fs.getFileStatus(p).getLen))
    val viaManifest = org.apache.spark.sql.graftbridge.GraftManifestScan
      .parquet(spark, spark.read.parquet(dir).schema, stats)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaManifest == (0L until 100L))
  }
}
