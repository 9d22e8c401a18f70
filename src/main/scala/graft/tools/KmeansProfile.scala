package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Adjudication instrument for the r12 SF10 watch item: embed_kmeans's
  * 100× big-side time drew 4.3 ↔ 10.4 s across the committed idle
  * double-run (143% spread, gc_big negligible) and min-of-two inside each
  * process did not absorb it — so the cause is something that varies
  * BETWEEN processes, not within one. This tool runs the exact gated trace
  * (SimilarityFunctions.kmeansTrace, k=8, iters=3 — 8 Spark jobs per rep:
  * 1 init collect, 4 inertia scans, 3 Lloyd update collects) `reps` times
  * in one JVM and prints, per rep, the wall total plus per-JOB wall /
  * executor-run / max-task / task-count from a listener — enough to name
  * which of straggler-task, scheduling gap (wall ≫ executor run), JIT
  * warm-up (rep 1 ≫ rest), or GC is carrying the spread.
  *
  * Usage: runMain graft.tools.KmeansProfile <sfDir> [reps=6]
  */
object KmeansProfile {

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
        (job, wall, aggs.map(_.tasks).sum, aggs.map(_.runMs).sum, aggs.map(_.maxTaskMs).maxOption.getOrElse(0L))
      }
      jobWallMs.clear(); stageOfJob.clear(); stageAgg.clear()
      out
    }
  }

  def main(args: Array[String]): Unit = {
    val dir  = args(0)
    val reps = if (args.length > 1) args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftSessionExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    for (rep <- 1 to reps) {
      System.gc()
      Thread.sleep(200) // let the listener bus drain the previous rep
      timer.drainJobs()
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val (n, inertias) = graft.functions.SimilarityFunctions.kmeansTrace(
        emb, "embedding", "vec_id", k = 8, iters = 3)
      val wall = (System.nanoTime() - t0) / 1e9
      val gc   = (gcMillis() - g0) / 1e3
      Thread.sleep(300)
      val jobs = timer.drainJobs()
      println(f"[rep $rep] wall=$wall%.3f s gc=$gc%.3f s n=$n inertia0=${inertias.head}%.1f")
      jobs.foreach { case (job, w, tasks, run, maxT) =>
        println(f"  job=$job%3d wall=${w / 1e3}%7.3f s  tasks=$tasks%4d  execRun=${run / 1e3}%8.3f s  maxTask=${maxT / 1e3}%7.3f s")
      }
    }
    spark.stop()
  }
}
