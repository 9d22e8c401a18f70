package graft.util

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Bounded-parallel execution of driver-side work items, each of which may
  * submit blocking Spark jobs — the N-ingest-workers shape of the reference's
  * staging pool (BlobStagingOrchestration.cs:123-138: worker count =
  * min(capacity, queue length)). Spark job submission is thread-safe; the
  * scheduler interleaves the concurrent jobs across executor cores instead of
  * serializing driver-side waits.
  */
object BoundedPar {

  /** Apply `f` to every item with at most `parallelism` concurrent calls.
    * Results preserve input order. If any call fails, the first failure (in
    * input order) is rethrown — after every submitted call has settled, so a
    * caller's per-item durable progress (e.g. checkpoint rows) is complete
    * for the items that did succeed.
    */
  def run[A, B](items: Seq[A], parallelism: Int)(f: A => B): Seq[B] = {
    val p = math.max(1, math.min(parallelism, items.size))
    if (p <= 1 || items.sizeIs <= 1) return items.map(f)
    val pool = Executors.newFixedThreadPool(p, (r: Runnable) => {
      val t = new Thread(r, "graft-ingest-worker")
      t.setDaemon(true)
      t
    })
    try {
      val futures = items.map(a => pool.submit(new Callable[B] { def call(): B = f(a) }))
      val settled = futures.map { fu =>
        try Right(fu.get())
        catch { case e: ExecutionException => Left(e.getCause) }
      }
      settled.foreach {
        case Left(e) => throw e
        case _       =>
      }
      settled.collect { case Right(b) => b }
    } finally pool.shutdown()
  }
}
