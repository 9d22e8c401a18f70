package graft.deltalog

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.collection.mutable

import graft.SparkSuite

/** Optimistic-concurrency contract of the commit log: two writers racing the
  * same next version must resolve to ONE winner per version — the loser's
  * rename fails (Hadoop LocalFileSystem, like HDFS/ABFS, refuses a rename
  * onto an existing destination and leaves it intact) and a retry lands on a
  * fresh version. No payload may be lost or duplicated, and the version
  * sequence must stay contiguous.
  */
class CommitRaceSpec extends SparkSuite {

  test("racing writers: every payload commits exactly once, versions contiguous") {
    val dir = tmpDir("commit-race")
    val writers = 2
    val perWriter = 15
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val conflicts = new java.util.concurrent.atomic.AtomicInteger()
    try {
      val futures = (0 until writers).map { wid =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val w = new DeltaLogWriter(spark, dir)
            start.await()
            (0 until perWriter).foreach { i =>
              var done = false
              while (!done) {
                try {
                  w.commit(Seq(s"""{"graftRaceProbe":{"writer":$wid,"seq":$i}}"""))
                  done = true
                } catch {
                  case _: IllegalStateException => conflicts.incrementAndGet() // retry
                }
              }
            }
          }
        })
      }
      start.countDown()
      futures.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdownNow()

    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val log = new org.apache.hadoop.fs.Path(dir, "_delta_log")
    val commits = fs.listStatus(log).map(_.getPath.getName)
      .filter(_.endsWith(".json")).sorted
    // contiguous versions 0..N-1
    assert(commits.length == writers * perWriter, commits.mkString(", "))
    commits.zipWithIndex.foreach { case (name, i) =>
      assert(name == f"$i%020d.json", s"gap in the commit sequence at $name")
    }
    // every payload exactly once
    val seen = mutable.Map.empty[(Int, Int), Int].withDefaultValue(0)
    commits.foreach { name =>
      val in = fs.open(new org.apache.hadoop.fs.Path(log, name))
      val text = scala.io.Source.fromInputStream(in).mkString
      in.close()
      val m = """"writer":(\d+),"seq":(\d+)""".r.findFirstMatchIn(text).get
      seen((m.group(1).toInt, m.group(2).toInt)) += 1
    }
    assert(seen.size == writers * perWriter)
    assert(seen.values.forall(_ == 1), "a payload committed more than once")
    // the race must actually have raced at least once to prove anything;
    // with a shared start latch and 15 rounds this is deterministic enough
    // in practice — log it rather than assert to keep the test unflaky
    info(s"observed ${conflicts.get()} commit conflicts (retries)")
  }
}
