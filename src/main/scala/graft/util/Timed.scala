package graft.util

/** Shared wall-clock helper for the tools mains (previously copy-pasted in
  * MetaScale / MultiScale / MetaSteady / StageProfile — round-15 review).
  */
object Timed {
  def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r  = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
