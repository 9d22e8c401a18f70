package graft.kql

import graft.SparkSuite
import graft.functions.KqlCompat
import graft.operators.Surface

/** Idempotence property for the KQL→Spark-SQL rewrite engine (r12 verdict
  * ask #7): ~100 sequential expandCalls passes plus a raw-text bag scanner
  * process every query string, and the round-12 dynamic-bag corruption was
  * an ORDERING bug in exactly this machinery. The collision allowlist
  * (RewriteCollisionSpec) reviews which expansions may EMIT later-handled
  * calls; this spec checks the complementary invariant — a rewrite OUTPUT
  * is a fixpoint (`rewrite(rewrite(x)) == rewrite(x)`), so no rewritten
  * text is ever corrupted by a second pass picking up something the first
  * pass emitted.
  *
  * Corpus: the REAL inputs — every string the registry's 260 queries push
  * through [[KqlCompat.rewrite]] while compiling at sf0.001, captured via
  * the `recordInputs` test hook. This covers every scalar fragment of
  * every KQL pipeline stage, not a hand-picked sample.
  */
class RewriteFixpointSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("rewrite is a fixpoint over every registry rewrite input") {
    val rec = new java.util.concurrent.ConcurrentLinkedQueue[String]
    KqlCompat.recordInputs = rec
    val buildFailures = scala.collection.mutable.ListBuffer.empty[String]
    try {
      Surface.registry.foreach { case (name, q) =>
        // building the frame compiles the KQL (analysis only — execution
        // correctness is SurfaceSpec/the oracle gate's job, not this one's)
        try q.fn(spark, sf)
        catch { case e: Exception => buildFailures += s"$name: ${e.getMessage}" }
      }
    } finally KqlCompat.recordInputs = null
    assert(buildFailures.isEmpty, s"queries failed to BUILD:\n${buildFailures.mkString("\n")}")

    val corpus = {
      val it = rec.iterator()
      val b = scala.collection.mutable.LinkedHashSet.empty[String]
      while (it.hasNext) b += it.next()
      b.toSeq
    }
    assert(corpus.size > 200, s"suspiciously small rewrite corpus: ${corpus.size}")

    val broken = corpus.flatMap { x =>
      val once = try Right(KqlCompat.rewrite(x)) catch { case e: Exception => Left(e) }
      once match {
        case Left(e) => Some(s"rewrite THREW on recorded input <$x>: $e")
        case Right(r1) =>
          val r2 = try Right(KqlCompat.rewrite(r1)) catch { case e: Exception => Left(e) }
          r2 match {
            case Left(e) => Some(s"second rewrite THREW on <$r1> (from <$x>): $e")
            case Right(v) if v != r1 =>
              Some(s"NOT A FIXPOINT\n  input:  $x\n  pass-1: $r1\n  pass-2: $v")
            case _ => None
          }
      }
    }
    assert(broken.isEmpty,
      s"${broken.size}/${corpus.size} rewrite outputs are not fixpoints:\n" +
        broken.take(10).mkString("\n---\n"))
    info(s"fixpoint holds over ${corpus.size} distinct recorded rewrite inputs")
  }
}
