package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** In-engine quality-classifier TRAINING — the "train a filter model on
  * the corpus, then score everything" step of an LLM data pipeline
  * (fastText-style quality filters), as distributed full-batch logistic
  * regression.
  *
  * Scale shape is pcaTrace's: the driver only ever holds the (d+1)-vector
  * of weights and per-round scalars; every round is ONE distributed
  * aggregation over the cached feature frame (gradient = d+1 avg's, loss
  * riding in the same pass — no per-row driver work, no explode). Rounds
  * are bounded and d is tiny, so the loop cost is R passes over the data —
  * the right posture at 100 TB where the feature frame is the corpus.
  *
  * Gates (the kmeans-inertia pattern): the logistic loss is CONVEX, so
  * full-batch descent with a sane step must strictly reduce it — a wrong
  * gradient or sigmoid lowering breaks monotonicity; on a separable label
  * the trained accuracy must clear a wide margin.
  */
object Classifier {

  /** One training trace: returns (n, nPos, losses[R+1], finalWeights,
    * trainAccuracy). `features` are Columns evaluated over `docs` (the
    * first implicit feature is the bias 1.0); `label` must be 0/1.
    */
  def logRegTrace(
      docs: DataFrame,
      features: Seq[Column],
      label: Column,
      iters: Int = 40,
      step: Double = 2.0): (Long, Long, Seq[Double], Seq[Double], Double) = {
    val d = features.size
    val xCols = features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"x$i") }
    val frame = docs.select((xCols :+ label.cast("double").as("y")): _*)
      .localCheckpoint(true) // evaluate features once; flat plan for R passes

    var w = Vector.fill(d + 1)(0.0) // bias + d feature weights
    def margin: Column =
      (lit(w(0)) +: (0 until d).map(i => col(s"x$i") * lit(w(i + 1)))).reduce(_ + _)

    val losses = Seq.newBuilder[Double]
    var n = 0L; var nPos = 0L
    for (t <- 0 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      // gradient of mean logloss: avg((p − y) · x_j); loss rides along.
      // The epsilon clamp keeps log() finite once the separable fit
      // saturates p to 0/1 in double arithmetic.
      val pc  = least(greatest(p, lit(1e-12)), lit(1.0 - 1e-12))
      val aggCols = Seq(
        count(lit(1)).as("n"),
        sum(col("y")).cast("long").as("np"),
        avg(-(col("y") * log(pc) + (lit(1.0) - col("y")) * log(lit(1.0) - pc))).as("loss"),
        avg(p - col("y")).as("g0")) ++
        (0 until d).map(i => avg((p - col("y")) * col(s"x$i")).as(s"g${i + 1}"))
      val agg = frame.agg(aggCols.head, aggCols.tail: _*)
      val row: Row = agg.head()
      n = row.getAs[Long]("n"); nPos = row.getAs[Long]("np")
      losses += row.getAs[Double]("loss")
      if (t < iters)
        w = Vector.tabulate(d + 1)(j => w(j) - step * row.getAs[Double](s"g$j"))
    }
    val acc = frame.agg(
      avg(when((margin > 0) === (col("y") > 0.5), 1.0).otherwise(0.0))).head().getDouble(0)
    (n, nPos, losses.result(), w, acc)
  }
}
