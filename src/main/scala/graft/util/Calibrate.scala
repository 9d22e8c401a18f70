package graft.util

/** Fixed-work CPU calibration probe for the bench instruments.
  *
  * Three consecutive rounds of committed local-bench totals drifted
  * 88.5 → 93.2 → 110.3 s with untouched queries moving ±15-20%, each episode
  * adjudicated as host variance (round-14 verdict, "What's wrong #2"). The
  * fix is to MEASURE the host instead of adjudicating it: every Bench /
  * ScaleBench run stamps a deterministic fixed-work probe at its start and
  * end (`calib` record fields), and `scripts/bench_diff.py` normalizes
  * per-query ratios by the calibration delta before applying its regression
  * bar — "host drift" becomes a quantity, not an essay.
  *
  * The work is a fixed iteration count (never time-targeted — fixed work is
  * what makes two runs comparable), mixing the integer hash and double math
  * the query engine's hot loops actually spend time in. The checksum is
  * returned and folded into a volatile sink so the JIT cannot elide it.
  */
object Calibrate {

  /** ~1 s of single-thread work on the round-15 reference host. */
  private val Iters = 300000000L

  @volatile private var sink = 0L // defeats dead-code elimination

  private def work(iters: Long, seed: Long): Long = {
    var h = seed ^ 1469598103934665603L
    var d = 1.0 + (seed & 7)
    var i = 0L
    while (i < iters) {
      h = (h ^ i) * 1099511628211L
      h ^= (h >>> 33)
      if ((i & 4095) == 0) d = math.sqrt(d + (h & 0xff).toDouble)
      i += 1
    }
    h ^ java.lang.Double.doubleToLongBits(d)
  }

  /** Wall seconds for the fixed single-thread workload (JIT pre-warmed). */
  def singleThreadSec(): Double = {
    sink ^= work(Iters / 20, 1L) // JIT warm-up, excluded from the timing
    val t0 = System.nanoTime()
    sink ^= work(Iters, 2L)
    (System.nanoTime() - t0) / 1e9
  }

  /** The calib record fragment Bench and ScaleBench stamp — single-sourced
    * so the field names bench_diff parses cannot drift between the two.
    */
  def recordJson(start1: Double, startN: Double, end1: Double, endN: Double,
      threads: Int): String =
    f"""{"s1":$start1%.3f,"sN":$startN%.3f,"e1":$end1%.3f,"eN":$endN%.3f,"threads":$threads}"""

  /** Wall seconds with `threads` concurrent copies of the SAME fixed
    * workload (per-core throughput under full load — the shape a 32-thread
    * local bench actually runs in). Distinct seeds keep the threads from
    * sharing cache lines through identical state.
    */
  def multiThreadSec(threads: Int): Double = {
    sink ^= work(Iters / 20, 3L)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => { sink ^= work(Iters, 100L + t) })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
}
