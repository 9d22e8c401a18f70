package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Process-wide accumulating phase timer for the metadata-plane instruments
  * (r12 verdict ask #1: the 196 s / 100k-blob E2E was ONE opaque number).
  * The orchestrator and state store wrap their phases in [[time]]; MetaScale
  * resets before a run and prints the snapshot as the record's breakdown.
  *
  * Attribution is to the INNERMOST label only (r16 verdict #5): when
  * `store.read` runs inside `store.compact`, the inner seconds accrue to
  * `store.read` and are SUBTRACTED from `store.compact`'s attribution, so
  * same-thread phases are disjoint and sum(phases) ≤ wall — record notes no
  * longer need a "nesting: X ⊃ Y" disclaimer. The nesting stack is
  * per-thread; phases running on WORKER threads (the bounded staging pool)
  * attribute to their own label and are not subtracted from a parent on a
  * different thread — across threads, concurrent phase seconds legitimately
  * exceed wall. Overhead is one ThreadLocal access + CHM lookup +
  * AtomicLong add per phase call (a handful per batch plus one per state
  * append), so it stays on in production code paths.
  */
object PhaseTimer {
  private val nanos = new ConcurrentHashMap[String, AtomicLong]()
  private val calls = new ConcurrentHashMap[String, AtomicLong]()

  /** Open frames on this thread; head = innermost. `childNs` accumulates
    * the FULL elapsed time of direct children, subtracted from this frame's
    * own attribution on close.
    */
  private final class Frame(var childNs: Long = 0L)
  private val active = new ThreadLocal[List[Frame]] {
    override def initialValue(): List[Frame] = Nil
  }

  def add(name: String, ns: Long): Unit = {
    nanos.computeIfAbsent(name, _ => new AtomicLong).addAndGet(ns)
    calls.computeIfAbsent(name, _ => new AtomicLong).incrementAndGet()
  }

  def time[T](name: String)(f: => T): T = {
    val frame = new Frame
    active.set(frame :: active.get)
    val t0 = System.nanoTime()
    try f
    finally {
      val elapsed = System.nanoTime() - t0
      active.set(active.get.tail)
      add(name, elapsed - frame.childNs) // self time only
      active.get match {
        case parent :: _ => parent.childNs += elapsed // parent excludes my whole span
        case Nil         => ()
      }
    }
  }

  /** (seconds, call count) per phase name accumulated since the last reset. */
  def snapshot(): Map[String, (Double, Long)] = {
    import scala.jdk.CollectionConverters._
    nanos.asScala.map { case (k, v) =>
      k -> (v.get() / 1e9, Option(calls.get(k)).map(_.get()).getOrElse(0L))
    }.toMap
  }

  def reset(): Unit = { nanos.clear(); calls.clear() }
}
