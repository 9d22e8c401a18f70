package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Adjudication instrument for the r13 SF10 watch item (verdict #3):
  * dedup_substring_spans drew 28.5 ↔ 35.7 s across the committed idle
  * double-run (25% spread) against the 31.5-32.1 s r11/r12 band, with
  * gc_big ≤ 0.6 s and code-cache normal — so neither allocation pressure
  * nor compilation state explains it. Same pattern as KmeansProfile: run
  * the exact gated query `reps` times in one JVM at the 100× replica and
  * print per-rep wall plus per-JOB wall / summed executor task time /
  * max single task / task count. Reads: a straggler task (maxTask ≫
  * run/tasks) names skew; wall ≫ execRun names scheduling gaps or I/O
  * waits; rep-1-only cost names warm-up; uniform variation across reps
  * with stable per-job shape names host variance.
  *
  * Usage: runMain graft.tools.SpansProfile <bigDir> [reps=5]
  * (bigDir = the 100× replica, e.g. /tmp/sf1x10 from tools.ScaleData)
  */
object SpansProfile {

  private class JobTimer extends SparkListener {
    case class StageAgg(var tasks: Int = 0, var runMs: Long = 0L, var maxTaskMs: Long = 0L)
    val stageOfJob = new java.util.concurrent.ConcurrentHashMap[Int, java.util.Set[Int]]()
    val stageAgg   = new java.util.concurrent.ConcurrentHashMap[Int, StageAgg]()
    val jobWallMs  = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()

    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobStart.put(e.jobId, e.time)
      val set = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      e.stageIds.foreach(set.add)
      stageOfJob.put(e.jobId, set)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      Option(jobStart.get(e.jobId)).foreach(s => jobWallMs.put(e.jobId, e.time - s))
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val agg = stageAgg.computeIfAbsent(e.stageId, _ => StageAgg())
      agg.synchronized {
        agg.tasks += 1
        val ms = e.taskInfo.duration
        agg.runMs += ms
        if (ms > agg.maxTaskMs) agg.maxTaskMs = ms
      }
    }
    def drainJobs(): Seq[(Int, Long, Int, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val out = jobWallMs.asScala.toSeq.sortBy(_._1).map { case (job, wall) =>
        val stages = Option(stageOfJob.get(job)).map(_.asScala.toSeq).getOrElse(Nil)
        val aggs = stages.flatMap(s => Option(stageAgg.get(s)))
        (job, wall, aggs.map(_.tasks).sum, aggs.map(_.runMs).sum,
          aggs.map(_.maxTaskMs).maxOption.getOrElse(0L))
      }
      jobWallMs.clear(); stageOfJob.clear(); stageAgg.clear()
      out
    }
  }

  def main(args: Array[String]): Unit = {
    val dir  = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same static/AQE broadcast posture as the committed SF10 records
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)

    import scala.jdk.CollectionConverters._
    def gcMillis(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum

    val fn = graft.operators.Surface.registry("dedup_substring_spans").fn
    for (rep <- 1 to reps) {
      graft.Bench.releaseAll(spark)
      System.gc()
      Thread.sleep(300)
      timer.drainJobs()
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val n  = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val gc   = (gcMillis() - g0) / 1e3
      Thread.sleep(300) // listener bus drain
      val jobs = timer.drainJobs()
      println(f"[rep $rep] wall=$wall%.3f s gc=$gc%.3f s rows=$n")
      jobs.foreach { case (job, w, tasks, run, maxT) =>
        println(f"  job=$job%3d wall=${w / 1e3}%7.3f s  tasks=$tasks%4d  " +
          f"execRun=${run / 1e3}%8.3f s  maxTask=${maxT / 1e3}%7.3f s")
      }
    }
    spark.stop()
  }
}
