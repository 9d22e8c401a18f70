package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed prefix operations in the frame's CURRENT global order.
  *
  * The naive Spark spelling — `sum(x) OVER (ORDER BY …)` — is a
  * single-partition WindowExec: every row moves to one task. The scalable
  * shape is the classic two-pass scan: after a global sort the frame is
  * RANGE-partitioned, so (1) one lightweight job folds each partition to a
  * single partial sum (the driver collects P scalars, not rows), (2) a
  * zero-shuffle second pass re-walks each partition carrying its exclusive
  * prefix offset.
  *
  * The two passes MUST see identical partition contents, so the shared RDD
  * is persisted (MEMORY_AND_DISK) before pass 1 — pass 1's collect
  * materializes the blocks and pass 2 re-reads them, so a nondeterministic
  * upstream (repartition without a defining sort, or a map-stage retry
  * recomputing with different interleaving) cannot make the partials
  * disagree with pass-2 contents. Spark's ContextCleaner unpersists the
  * blocks automatically once the result frame is no longer referenced.
  */
object ScanOps {

  /** Pin the frame's rows for the duration of the two-pass scan. */
  private def pinned(df: DataFrame) = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)

  /** Append `outCol` = running sum of `valueCol` in the current row order.
    * Integral inputs accumulate in Long (exact, overflow-checked);
    * fractional in Double. Nulls contribute zero and yield the running sum
    * so far.
    */
  def cumSum(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(valueCol)
    val integral = df.schema(idx).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType                        => false
      case dt => throw new IllegalArgumentException(
        s"row_cumsum needs a numeric column, got ${dt.catalogString}")
    }
    val rdd = pinned(df)
    if (integral) {
      def valueOf(r: Row): Long =
        if (r.isNullAt(idx)) 0L else r.get(idx).asInstanceOf[java.lang.Number].longValue()
      val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = 0L
        it.foreach(r => acc = Math.addExact(acc, valueOf(r)))
        Iterator((pid, acc))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partials.scanLeft(0L)(Math.addExact)
      val out = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = offsets(pid)
        it.map { r => acc = Math.addExact(acc, valueOf(r)); Row.fromSeq(r.toSeq :+ acc) }
      }
      df.sparkSession.createDataFrame(out, df.schema.add(outCol, LongType, nullable = false))
    } else {
      def valueOf(r: Row): Double =
        if (r.isNullAt(idx)) 0.0 else r.get(idx).asInstanceOf[java.lang.Number].doubleValue()
      val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = 0.0
        it.foreach(r => acc += valueOf(r))
        Iterator((pid, acc))
      }.collect().sortBy(_._1).map(_._2)
      val offsets = partials.scanLeft(0.0)(_ + _)
      val out = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = offsets(pid)
        it.map { r => acc += valueOf(r); Row.fromSeq(r.toSeq :+ acc) }
      }
      df.sparkSession.createDataFrame(out, df.schema.add(outCol, DoubleType, nullable = false))
    }
  }

  /** [[cumSum]] with ADX `row_cumsum(term, restart)` semantics: at a row
    * whose `restartCol` is true the accumulation restarts (cum = term at
    * that row); nulls in `restartCol` mean no restart. Same two-pass shape:
    * pass 1 folds each partition to (sum since its last restart, had a
    * restart?); the incoming offset for partition p is then carry(p) where
    * carry advances as `if (restarted) tailSum else carry + partSum` — a
    * restart anywhere in a partition makes everything before it irrelevant
    * to the partitions after.
    */
  def cumSumRestart(df: DataFrame, valueCol: String, restartCol: String,
      outCol: String): DataFrame = {
    val idx  = df.schema.fieldIndex(valueCol)
    val rIdx = df.schema.fieldIndex(restartCol)
    require(df.schema(rIdx).dataType == BooleanType,
      s"row_cumsum restart needs a boolean column, got ${df.schema(rIdx).dataType.catalogString}")
    val integral = df.schema(idx).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType                        => false
      case dt => throw new IllegalArgumentException(
        s"row_cumsum needs a numeric column, got ${dt.catalogString}")
    }
    val rdd = pinned(df)
    def restartOf(r: Row): Boolean = !r.isNullAt(rIdx) && r.getBoolean(rIdx)
    if (integral) {
      def valueOf(r: Row): Long =
        if (r.isNullAt(idx)) 0L else r.get(idx).asInstanceOf[java.lang.Number].longValue()
      val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = 0L; var restarted = false
        it.foreach { r =>
          if (restartOf(r)) { acc = valueOf(r); restarted = true }
          else acc = Math.addExact(acc, valueOf(r))
        }
        Iterator((pid, acc, restarted))
      }.collect().sortBy(_._1)
      val seeds = new Array[Long](partials.length)
      var carry = 0L
      partials.foreach { case (pid, acc, restarted) =>
        seeds(pid) = carry
        carry = if (restarted) acc else Math.addExact(carry, acc)
      }
      val out = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = seeds(pid)
        it.map { r =>
          if (restartOf(r)) acc = valueOf(r)
          else acc = Math.addExact(acc, valueOf(r))
          Row.fromSeq(r.toSeq :+ acc)
        }
      }
      df.sparkSession.createDataFrame(out, df.schema.add(outCol, LongType, nullable = false))
    } else {
      def valueOf(r: Row): Double =
        if (r.isNullAt(idx)) 0.0 else r.get(idx).asInstanceOf[java.lang.Number].doubleValue()
      val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = 0.0; var restarted = false
        it.foreach { r =>
          if (restartOf(r)) { acc = valueOf(r); restarted = true }
          else acc += valueOf(r)
        }
        Iterator((pid, acc, restarted))
      }.collect().sortBy(_._1)
      val seeds = new Array[Double](partials.length)
      var carry = 0.0
      partials.foreach { case (pid, acc, restarted) =>
        seeds(pid) = carry
        carry = if (restarted) acc else carry + acc
      }
      val out = rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = seeds(pid)
        it.map { r =>
          if (restartOf(r)) acc = valueOf(r) else acc += valueOf(r)
          Row.fromSeq(r.toSeq :+ acc)
        }
      }
      df.sparkSession.createDataFrame(out, df.schema.add(outCol, DoubleType, nullable = false))
    }
  }

  /** Append `outCol` = the PREVIOUS row's `valueCol` in the current global
    * order (null for the very first row). Boundary exchange instead of a
    * window: pass 1 collects each partition's last value (P scalars to the
    * driver), pass 2 walks each partition seeded with the nearest preceding
    * non-empty partition's last value. Type-preserving, zero shuffle.
    */
  def lag1(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(valueCol)
    val rdd = pinned(df)
    val lasts = rdd.mapPartitionsWithIndex { (pid, it) =>
      var last = Option.empty[Any]
      it.foreach(r => last = Some(r.get(idx)))
      Iterator((pid, last))
    }.collect().sortBy(_._1).map(_._2)
    // seed for partition p = last value of the nearest non-empty partition
    // before p (scanLeft keeps the latest Some seen so far)
    val seeds = lasts.scanLeft(Option.empty[Any])((acc, l) => l.orElse(acc)).init
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var prev = seeds(pid)
      it.map { r =>
        val v = prev.orNull
        prev = Some(r.get(idx))
        Row.fromSeq(r.toSeq :+ v)
      }
    }
    df.sparkSession.createDataFrame(out,
      df.schema.add(outCol, df.schema(idx).dataType, nullable = true))
  }

  /** Append `outCol` = the NEXT row's `valueCol` in the current global order
    * (null for the very last row) — the mirror of [[lag1]]: pass 1 collects
    * each partition's FIRST value, pass 2 walks with one-element lookahead,
    * seeding the partition tail with the nearest following non-empty
    * partition's first value.
    */
  def lead1(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val idx = df.schema.fieldIndex(valueCol)
    val rdd = pinned(df)
    val firsts = rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator((pid, if (it.hasNext) Some(it.next().get(idx)) else None))
    }.collect().sortBy(_._1).map(_._2)
    val seeds = firsts.scanRight(Option.empty[Any])((f, acc) => f.orElse(acc)).tail
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      new Iterator[Row] {
        private var cur: Row = if (it.hasNext) it.next() else null
        override def hasNext: Boolean = cur != null
        override def next(): Row = {
          val nxt = if (it.hasNext) it.next() else null
          val v   = if (nxt != null) nxt.get(idx) else seeds(pid).orNull
          val r   = Row.fromSeq(cur.toSeq :+ v)
          cur = nxt
          r
        }
      }
    }
    df.sparkSession.createDataFrame(out,
      df.schema.add(outCol, df.schema(idx).dataType, nullable = true))
  }

  /** Append `outCol` = #rows since the most recent TRUE of `condCol` at or
    * before this row in the current global order (0 on a TRUE row; null
    * before the first TRUE). Same two-pass shape as [[cumSumRestart]]:
    * pass 1 folds each partition to (rowCount, distance-at-end), the driver
    * threads the carry through P scalars, pass 2 re-walks seeded — zero
    * shuffle.
    */
  def distSinceTrue(df: DataFrame, condCol: String, outCol: String): DataFrame = {
    val cIdx = df.schema.fieldIndex(condCol)
    require(df.schema(cIdx).dataType == BooleanType,
      s"distSinceTrue needs a boolean column, got ${df.schema(cIdx).dataType.catalogString}")
    def condOf(r: Row): Boolean = !r.isNullAt(cIdx) && r.getBoolean(cIdx)
    val rdd = pinned(df)
    val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var dist = Option.empty[Long]
      it.foreach { r =>
        dist = if (condOf(r)) Some(0L) else dist.map(_ + 1)
        n += 1
      }
      Iterator((pid, n, dist))
    }.collect().sortBy(_._1)
    val seeds = new Array[Option[Long]](partials.length)
    var carry = Option.empty[Long]
    partials.foreach { case (pid, n, dist) =>
      seeds(pid) = carry
      carry = dist.orElse(carry.map(_ + n))
    }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var st = seeds(pid)
      it.map { r =>
        st = if (condOf(r)) Some(0L) else st.map(_ + 1)
        Row.fromSeq(r.toSeq :+ st.map(Long.box).orNull)
      }
    }
    df.sparkSession.createDataFrame(out, df.schema.add(outCol, LongType, nullable = true))
  }

  /** Mirror of [[distSinceTrue]]: #rows until the NEXT TRUE of `condCol` at
    * or after this row (0 on a TRUE row; null after the last TRUE). Pass 2
    * buffers one partition and walks it backwards, seeded with the carry
    * folded from the right.
    */
  def distToNextTrue(df: DataFrame, condCol: String, outCol: String): DataFrame = {
    val cIdx = df.schema.fieldIndex(condCol)
    require(df.schema(cIdx).dataType == BooleanType,
      s"distToNextTrue needs a boolean column, got ${df.schema(cIdx).dataType.catalogString}")
    def condOf(r: Row): Boolean = !r.isNullAt(cIdx) && r.getBoolean(cIdx)
    val rdd = pinned(df)
    val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var first = Option.empty[Long]
      it.foreach { r =>
        if (condOf(r) && first.isEmpty) first = Some(n)
        n += 1
      }
      Iterator((pid, n, first)) // first = 0-based index of first TRUE
    }.collect().sortBy(_._1)
    val seeds = new Array[Option[Long]](partials.length)
    var carry = Option.empty[Long] // dist-to-next-TRUE at the suffix head
    partials.indices.reverse.foreach { i =>
      val (_, n, first) = partials(i)
      seeds(i) = carry
      carry = first.orElse(carry.map(_ + n))
    }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.toArray
      var st   = seeds(pid)
      val res  = new Array[Row](rows.length)
      rows.indices.reverse.foreach { i =>
        st = if (condOf(rows(i))) Some(0L) else st.map(_ + 1)
        res(i) = Row.fromSeq(rows(i).toSeq :+ st.map(Long.box).orNull)
      }
      res.iterator
    }
    df.sparkSession.createDataFrame(out, df.schema.add(outCol, LongType, nullable = true))
  }
}
