package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Logistic-regression trainer: convex-loss descent, separable fit,
  * noise-feature robustness, and the sf0.001 corpus gate rehearsal.
  */
class ClassifierSpec extends SparkSuite {

  import spark.implicits._

  test("separable 1-feature problem: loss plunges, accuracy hits 1.0") {
    val df = ((1 to 40).map(i => (1.0, 1)) ++ (1 to 60).map(i => (0.0, 0)))
      .toDF("x", "y")
    val (n, nPos, losses, w, acc) =
      Classifier.logRegTrace(df, Seq(col("x")), col("y"), iters = 40)
    assert(n == 100 && nPos == 40)
    assert(losses.head > 0.69 && losses.head < 0.70) // ln 2 at w = 0
    assert(losses.last < 0.2, s"final loss ${losses.last}")
    assert(losses.zip(losses.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"loss not monotone: $losses")
    assert(acc == 1.0)
    assert(w(1) > 0)
  }

  test("pure-noise feature stays near zero weight; informative one dominates") {
    val df = (1 to 200).map { i =>
      val y = i % 2
      (y.toDouble, (i % 7).toDouble / 7.0, y) // x1 = label, x2 = noise
    }.toDF("x1", "x2", "y")
    val (_, _, _, w, acc) =
      Classifier.logRegTrace(df, Seq(col("x1"), col("x2")), col("y"), iters = 40)
    assert(acc >= 0.99)
    assert(math.abs(w(2)) < math.abs(w(1)) / 3, s"noise weight too large: $w")
  }

  test("corpus gate rehearsal at sf0.001: the registry thresholds hold") {
    val docs  = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = split(col("text"), " ")
    val feats = Seq(
      least(size(filter(words, x => x === "the")), lit(3)).cast("double"),
      size(words).cast("double") / lit(100.0),
      size(array_distinct(words)).cast("double") / size(words).cast("double"))
    val label = array_contains(words, "the").cast("int")
    val (n, nPos, losses, w, acc) =
      Classifier.logRegTrace(docs, feats, label, 40, 2.0)
    assert(n > 0 && nPos > 0 && nPos < n)
    assert(losses.head > losses.last + 0.1,
      s"loss drop too small: ${losses.head} -> ${losses.last}")
    assert(acc >= 0.95, s"accuracy $acc below the registry gate")
    assert(w(1) > 0)
  }
}
