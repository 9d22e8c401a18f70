package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Process-wide accumulating phase timer for the metadata-plane instruments
  * (r12 verdict ask #1: the 196 s / 100k-blob E2E was ONE opaque number).
  * The orchestrator and state store wrap their phases in [[time]]; MetaScale
  * resets before a run and prints the snapshot as the record's breakdown.
  *
  * Counters nest deliberately (orch.stage CONTAINS mirror.stage and
  * store.append seconds) — the report names the nesting instead of
  * double-subtracting. Overhead is one CHM lookup + AtomicLong add per
  * phase call (a handful per batch plus one per state append), so it stays
  * on in production code paths.
  */
object PhaseTimer {
  private val nanos = new ConcurrentHashMap[String, AtomicLong]()
  private val calls = new ConcurrentHashMap[String, AtomicLong]()

  def add(name: String, ns: Long): Unit = {
    nanos.computeIfAbsent(name, _ => new AtomicLong).addAndGet(ns)
    calls.computeIfAbsent(name, _ => new AtomicLong).incrementAndGet()
  }

  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally add(name, System.nanoTime() - t0)
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
