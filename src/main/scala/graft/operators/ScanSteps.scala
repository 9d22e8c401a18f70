package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Restricted KQL `scan`: the sessionize/funnel subset — an ordered
  * per-key row-sequence state machine, with optional declared state
  * variables and per-step assignments ([[ScanSteps.scanDeclare]]).
  *
  * Reference semantics: the full ADX `scan` operator
  * (Kusto docs; the reference itself never emits `scan`, see SURVEY §2.g)
  * runs a declared multi-step state machine over serialized rows, spawning
  * concurrent sequence instances. This operator implements the restricted
  * single-instance subset that covers the dominant uses (funnel
  * attribution, session stitching, sequence-scoped accumulators) with
  * spelled-out semantics:
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
  *  - Per-step `output` modes (ADX's `step s output = all|last|none:`):
  *    `All` (the ADX default) emits EVERY row the step admits, with the
  *    state/variable columns as of that row; `Silent` (`none`) suppresses
  *    the step's rows; `Last` holds the step's latest admitted row and
  *    emits it only when a sequence COMPLETES (abandoned spans — replaced
  *    by a restart or cut off at key end — emit nothing; ADX leaves this
  *    edge unspecified, this engine pins completion-scoped emission).
  *    [[scanSteps]] is the funnel sugar: `Silent` on every non-final step.
  *  - `with_match_id`: a per-key 0-based sequence counter — every step-0
  *    admission starts a new sequence id (a restart is a NEW match
  *    instance, as in ADX's one-active-sequence-per-step model); emitted
  *    rows carry the id of the sequence they extended.
  *
  * For two steps (A, B) this is exactly: each B whose latest preceding A
  * is later than the previous B row completes, attributed to that latest
  * A — the closed form the DuckDB window/lag oracle checks.
  */
object ScanSteps {

  /** Per-step output mode — ADX `output = all | last | none`. */
  sealed trait ScanOutput
  object ScanOutput {
    /** Emit every row the step admits (ADX default). */
    case object All extends ScanOutput
    /** Emit the step's latest admitted row, at sequence completion only. */
    case object Last extends ScanOutput
    /** Emit nothing for this step (`output = none`). */
    case object Silent extends ScanOutput
  }

  /** A declared scan state variable: carried per key across rows, reset to
    * `init` at key change and at sequence completion (NOT at a step-0
    * restart — so a counter accumulated across restarts measures the whole
    * completion-to-completion span, the ADX `declare` lifecycle).
    */
  final case class ScanVarDef(name: String, dataType: DataType, init: Any)

  /** State-variable update algebra. The row-side operand is an arbitrary
    * `Column` staged BEFORE the fold (codegen'd, like step conditions); the
    * state-side combine is one of these fixed forms, applied per matching
    * row in the per-partition fold. This covers the dominant ADX `scan`
    * assignments (running counters/sums, min/max capture, first/last value)
    * without interpreting arbitrary expressions against fold state.
    */
  sealed trait ScanUpdate { def operand: Column }
  object ScanUpdate {
    /** `v = expr(row)` — overwrite (last-value capture). */
    final case class SetTo(operand: Column) extends ScanUpdate
    /** `v = v + expr(row)` — accumulate; null operand is a no-op. */
    final case class Add(operand: Column) extends ScanUpdate
    /** `v = max(v, expr(row))` — null-safe. */
    final case class MaxOf(operand: Column) extends ScanUpdate
    /** `v = min(v, expr(row))` — null-safe. */
    final case class MinOf(operand: Column) extends ScanUpdate
    /** `v = coalesce(v, expr(row))` — first non-null wins. */
    final case class FirstOf(operand: Column) extends ScanUpdate
  }

  /** One scan step: name, admission condition, the state-variable updates
    * to apply when a row matches this step, and the output mode (ADX
    * default: `All`).
    */
  final case class ScanStepDef(name: String, cond: Column,
      updates: Seq[(String, ScanUpdate)] = Nil,
      output: ScanOutput = ScanOutput.All)

  /** Funnel sugar: completion rows only — `Silent` on every non-final
    * step, `All` on the final one.
    * @param steps (name, condition) pairs, in sequence order.
    */
  def scanSteps(df: DataFrame, keyCols: Seq[String], orderCol: String,
      ascending: Boolean, steps: Seq[(String, Column)]): DataFrame =
    scanDeclare(df, keyCols, orderCol, ascending, Nil,
      steps.zipWithIndex.map { case ((name, c), i) =>
        ScanStepDef(name, c, Nil,
          if (i == steps.size - 1) ScanOutput.All else ScanOutput.Silent)
      })

  /** The declared-state generalization: the funnel state machine of
    * [[scanSteps]] plus per-key state variables with per-step assignments.
    * Same scale contract — ONE shuffle on the key, then a streaming
    * per-partition fold; per-key state is O(steps + vars); all row-side
    * expressions (conditions AND update operands) evaluate as staged
    * codegen'd columns, the fold only combines scalars.
    *
    * Emitted rows carry the matched row's columns, `<step>_<orderCol>`
    * per step (state as of that row; unreached steps null), the declared
    * variables' values at that point, and — when `matchId` is set — the
    * per-key sequence id column.
    */
  def scanDeclare(df: DataFrame, keyCols: Seq[String], orderCol: String,
      ascending: Boolean, vars: Seq[ScanVarDef],
      steps: Seq[ScanStepDef], matchId: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "scan needs at least one step")
    require(steps.map(_.name).distinct.size == steps.size, "scan step names must be unique")
    require(vars.map(_.name).distinct.size == vars.size, "scan declare names must be unique")
    val varIdx = vars.map(_.name).zipWithIndex.toMap
    steps.foreach(_.updates.foreach { case (v, _) =>
      require(varIdx.contains(v), s"scan step assigns undeclared variable '$v'")
    })
    val n  = steps.size
    val nv = vars.size
    val condNames = steps.indices.map(i => s"__graft_scan_c$i")
    val updNames  = steps.zipWithIndex.flatMap { case (st, i) =>
      st.updates.indices.map(k => s"__graft_scan_u${i}_$k")
    }
    val updCols = steps.flatMap(_.updates.map(_._2.operand))
    val staged0 = steps.zipWithIndex.foldLeft(df) { case (d, (st, i)) =>
      d.withColumn(condNames(i), st.cond)
    }
    val withConds = updNames.zip(updCols).foldLeft(staged0) { case (d, (nm, c)) =>
      d.withColumn(nm, c)
    }
    val schema  = withConds.schema
    val keyIdx  = keyCols.map(schema.fieldIndex)
    val ordIdx  = schema.fieldIndex(orderCol)
    val condIdx = condNames.map(schema.fieldIndex)
    // per step: (varSlot, combineKind, stagedColIdx) — the Column inside
    // ScanUpdate must NOT reach the task closure (not serializable); the
    // fold only needs the combine kind
    val updPlan: Array[Array[(Int, Int, Int)]] = {
      var off = 0
      steps.map { st =>
        st.updates.map { case (v, u) =>
          val kind = u match {
            case _: ScanUpdate.SetTo   => KindSet
            case _: ScanUpdate.Add     => KindAdd
            case _: ScanUpdate.MaxOf   => KindMax
            case _: ScanUpdate.MinOf   => KindMin
            case _: ScanUpdate.FirstOf => KindFirst
          }
          val t = (varIdx(v), kind, schema.fieldIndex(updNames(off))); off += 1; t
        }.toArray
      }.toArray
    }
    val varTypes = vars.map(_.dataType).toArray
    val varInit  = vars.map(_.init).toArray
    val nOrig    = df.schema.fields.length
    val ordField = df.schema(df.schema.fieldIndex(orderCol))
    val outSchema = StructType(
      df.schema.fields ++ steps.map { st =>
        StructField(s"${st.name}_$orderCol", ordField.dataType, nullable = true)
      } ++ vars.map(v => StructField(v.name, v.dataType, nullable = true)) ++
        matchId.map(m => StructField(m, LongType, nullable = false)).toSeq)
    // output modes as ints — the ADT must not reach the task closure
    val outModes: Array[Int] = steps.map(_.output match {
      case ScanOutput.All    => OutAll
      case ScanOutput.Last   => OutLast
      case ScanOutput.Silent => OutSilent
    }).toArray
    val hasMid = matchId.isDefined
    val sortCols = keyCols.map(col) :+ (if (ascending) col(orderCol).asc else col(orderCol).desc)
    val parts = withConds
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(sortCols: _*)
    val out = parts.rdd.mapPartitions { it =>
      var curKey: Seq[Any] = null
      val state   = new Array[Any](n)  // per-step orderCol value; null = unfilled
      val varVals = new Array[Any](nv) // declared variables
      val held    = new Array[Row](n)  // output=Last snapshots awaiting completion
      var seqCounter = 0L              // per-key 0-based sequence ids
      var curSeq     = 0L
      def resetVars(): Unit = { var k = 0; while (k < nv) { varVals(k) = varInit(k); k += 1 } }
      it.flatMap { r =>
        // snapshots capture state/vars/sequence id AS OF the matched row
        def snapshot(stepVals: Seq[Any]): Row = Row.fromSeq(
          (0 until nOrig).map(r.get) ++ stepVals ++ varVals.toSeq ++
            (if (hasMid) Seq(java.lang.Long.valueOf(curSeq)) else Nil))
        var buf: scala.collection.mutable.ArrayBuffer[Row] = null
        def emit(x: Row): Unit = {
          if (buf == null) buf = new scala.collection.mutable.ArrayBuffer[Row](2)
          buf += x
        }
        val k = keyIdx.map(r.get)
        if (k != curKey) {
          curKey = k
          java.util.Arrays.fill(state.asInstanceOf[Array[AnyRef]], null)
          java.util.Arrays.fill(held.asInstanceOf[Array[AnyRef]], null)
          resetVars()
          seqCounter = 0L
          curSeq = 0L
        }
        def holds(i: Int): Boolean = !r.isNullAt(condIdx(i)) && r.getBoolean(condIdx(i))
        // deepest extendable step first: a row that could both complete and
        // restart advances the sequence
        var i = n - 1
        var matched = false
        while (i >= 0 && !matched) {
          if (holds(i) && (i == 0 || state(i - 1) != null)) {
            matched = true
            // a step-0 admission starts a NEW sequence instance (a restart
            // replaces the active one — ADX one-active-sequence-per-step)
            if (i == 0) { curSeq = seqCounter; seqCounter += 1 }
            val ups = updPlan(i)
            var u = 0
            while (u < ups.length) {
              val (slot, kind, colI) = ups(u)
              val operand = if (r.isNullAt(colI)) null else r.get(colI)
              varVals(slot) = combine(varTypes(slot), kind, varVals(slot), operand)
              u += 1
            }
            if (i == n - 1) {
              val comp = snapshot((0 until n - 1).map(state(_)) :+ r.get(ordIdx))
              // completion flushes held output=Last rows in step order,
              // then the completing row itself (unless the final step is
              // Silent); everything resets for the next sequence
              var j = 0
              while (j < n - 1) {
                if (held(j) != null) { emit(held(j)); held(j) = null }
                j += 1
              }
              if (outModes(i) != OutSilent) emit(comp)
              java.util.Arrays.fill(state.asInstanceOf[Array[AnyRef]], null)
              resetVars() // declared state is completion-to-completion scoped
            } else {
              state(i) = r.get(ordIdx)
              var j = i + 1
              // restart-from-here abandons deeper spans: their held rows
              // never complete and emit nothing
              while (j < n) { state(j) = null; held(j) = null; j += 1 }
              val snap =
                if (outModes(i) == OutSilent) null
                else snapshot((0 until n).map(state(_)))
              outModes(i) match {
                case OutAll  => emit(snap)
                case OutLast => held(i) = snap // replaces the span's previous
                case _       => ()
              }
            }
          }
          i -= 1
        }
        if (buf == null) Iterator.empty else buf.iterator
      }
    }
    df.sparkSession.createDataFrame(out, outSchema)
  }

  /** Coerce a staged operand onto the declared variable's type (staged
    * literals often arrive as Int where the variable is long).
    */
  private def asVarType(dt: DataType, v: Any): Any = v match {
    case null => null
    case x: Number => dt match {
      case LongType    => java.lang.Long.valueOf(x.longValue())
      case DoubleType  => java.lang.Double.valueOf(x.doubleValue())
      case IntegerType => java.lang.Integer.valueOf(x.intValue())
      case _           => v
    }
    case _ => v
  }

  private final val KindSet   = 0
  private final val KindAdd   = 1
  private final val KindMax   = 2
  private final val KindMin   = 3
  private final val KindFirst = 4

  private final val OutAll    = 0
  private final val OutLast   = 1
  private final val OutSilent = 2

  private def combine(dt: DataType, kind: Int, cur: Any, operand: Any): Any =
    kind match {
      case KindSet => asVarType(dt, operand)
      case KindAdd =>
        if (operand == null) cur
        else if (cur == null) asVarType(dt, operand)
        else dt match {
          case DoubleType =>
            java.lang.Double.valueOf(
              cur.asInstanceOf[Number].doubleValue() + operand.asInstanceOf[Number].doubleValue())
          case _ =>
            java.lang.Long.valueOf(
              cur.asInstanceOf[Number].longValue() + operand.asInstanceOf[Number].longValue())
        }
      case KindMax =>
        if (operand == null) cur
        else if (cur == null) asVarType(dt, operand)
        else {
          val o = asVarType(dt, operand)
          if (o.asInstanceOf[Comparable[Any]].compareTo(cur) > 0) o else cur
        }
      case KindMin =>
        if (operand == null) cur
        else if (cur == null) asVarType(dt, operand)
        else {
          val o = asVarType(dt, operand)
          if (o.asInstanceOf[Comparable[Any]].compareTo(cur) < 0) o else cur
        }
      case KindFirst =>
        if (cur != null) cur else asVarType(dt, operand)
    }
}
