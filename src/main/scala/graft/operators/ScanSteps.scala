package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Restricted KQL `scan`: the sessionize/funnel subset — an ordered
  * per-key row-sequence state machine.
  *
  * Reference semantics: the full ADX `scan` operator
  * (Kusto docs; the reference itself never emits `scan`, see SURVEY §2.g)
  * runs a declared multi-step state machine over serialized rows, spawning
  * concurrent sequence instances. This operator implements the restricted
  * single-instance subset that covers the dominant uses (funnel
  * attribution, session stitching) with spelled-out semantics:
  *
  *  - Rows are processed per `key`, ordered by `orderCol` — the scale
  *    contract: ONE shuffle on the key, then a streaming per-partition
  *    fold (`sortWithinPartitions` + `mapPartitions`); keys are
  *    contiguous within a partition, state is O(steps) per key, and no
  *    row set ever materializes on the driver.
  *  - State holds, per non-final step, the `orderCol` value of the LATEST
  *    row that reached it. A row advances the DEEPEST step it can extend
  *    (its condition holds and the previous step is filled); matching an
  *    earlier step overwrites that step and clears deeper ones
  *    (restart-from-here). Rows matching nothing are passed over.
  *  - When the FINAL step matches, one output row emits — the completing
  *    row's columns plus `<stepName>_<orderCol>` for every step (the final
  *    step's value is the completing row's own) — and the key's state
  *    resets fully, so the next completion needs a fresh full sequence.
  *
  * For two steps (A, B) this is exactly: each B whose latest preceding A
  * is later than the previous B row completes, attributed to that latest
  * A — the closed form the DuckDB window/lag oracle checks.
  */
object ScanSteps {

  /** @param steps (name, condition) pairs, in sequence order. */
  def scanSteps(df: DataFrame, keyCols: Seq[String], orderCol: String,
      ascending: Boolean, steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "scan needs at least one step")
    require(steps.map(_._1).distinct.size == steps.size, "scan step names must be unique")
    val n = steps.size
    val condNames = steps.indices.map(i => s"__graft_scan_c$i")
    val withConds = steps.zipWithIndex.foldLeft(df) { case (d, ((_, c), i)) =>
      d.withColumn(condNames(i), c)
    }
    val schema  = withConds.schema
    val keyIdx  = keyCols.map(schema.fieldIndex)
    val ordIdx  = schema.fieldIndex(orderCol)
    val condIdx = condNames.map(schema.fieldIndex)
    val nOrig   = df.schema.fields.length
    val ordField = df.schema(df.schema.fieldIndex(orderCol))
    val outSchema = StructType(df.schema.fields ++ steps.map { case (name, _) =>
      StructField(s"${name}_$orderCol", ordField.dataType, nullable = true)
    })
    val sortCols = keyCols.map(col) :+ (if (ascending) col(orderCol).asc else col(orderCol).desc)
    val parts = withConds
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
    val out = parts.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      val state = new Array[Any](n) // per-step orderCol value; null = unfilled
      it.flatMap { r =>
        val k = keyIdx.map(r.get)
        if (k != curKey) { curKey = k; java.util.Arrays.fill(state.asInstanceOf[Array[AnyRef]], null) }
        def holds(i: Int): Boolean = !r.isNullAt(condIdx(i)) && r.getBoolean(condIdx(i))
        // deepest extendable step first: a row that could both complete and
        // restart advances the sequence
        var i = n - 1
        var emitted: Option[Row] = None
        var matched = false
        while (i >= 0 && !matched) {
          if (holds(i) && (i == 0 || state(i - 1) != null)) {
            matched = true
            if (i == n - 1) {
              val stepVals = (0 until n - 1).map(state(_)) :+ r.get(ordIdx)
              emitted = Some(Row.fromSeq((0 until nOrig).map(r.get) ++ stepVals))
              java.util.Arrays.fill(state.asInstanceOf[Array[AnyRef]], null)
            } else {
              state(i) = r.get(ordIdx)
              var j = i + 1
              while (j < n) { state(j) = null; j += 1 }
            }
          }
          i -= 1
        }
        emitted.iterator
      }
    }
    df.sparkSession.createDataFrame(out, outSchema)
  }
}
