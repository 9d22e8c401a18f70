package graft.txlog

import java.time.Instant

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure log algebra — the tests the reference lacks
  * (SURVEY §5 implications): Coalesce/Delta are pure functions, ideal for
  * scalacheck.
  */
class TxLogSpec extends AnyFunSuite {

  /** Plain-scalacheck runner (scalatestplus isn't on the offline classpath). */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val T0 = Instant.parse("2026-01-01T00:00:00Z")

  private def item(action: TxAction, path: String, tx: Long,
      state: TxState = TxState.Initial): TransactionItem =
    TransactionItem("t", tx, tx, action, state, T0, blobPath = Some(path))

  private def meta(tx: Long, cols: Seq[ColumnSpec] = Seq(ColumnSpec("id", "BIGINT")),
      pcols: Seq[String] = Nil): TransactionItem =
    TransactionItem("t", tx, tx, TxAction.Schema, TxState.Initial, T0,
      partitionColumns = Some(pcols), schema = Some(cols))

  private val pathGen  = Gen.oneOf((0 until 12).map(i => s"f$i.parquet"))
  private val pathsGen = Gen.containerOf[Set, String](pathGen)

  // ---- coalesce (J1) ------------------------------------------------------

  test("coalesce annihilates blobs added and removed within the batch") {
    check(Prop.forAll(pathsGen, pathsGen) { (addPaths, removePaths) =>
      (addPaths.nonEmpty && removePaths.nonEmpty) ==> {
        val a = TxLog(Some(meta(0)) , None, addPaths.toSeq.map(item(TxAction.Add, _, 0)), Nil)
        val b = TxLog(None, None, Nil, removePaths.toSeq.map(item(TxAction.Remove, _, 1)))
        val out = a.coalesce(b)
        val survivors = out.adds.flatMap(_.blobPath).toSet
        val removes   = out.removes.flatMap(_.blobPath).toSet
        survivors == (addPaths -- removePaths) &&
          removes == (removePaths -- addPaths) &&
          out.startTxId == 0 && out.endTxId == 1
      }
    })
  }

  test("coalesce fold is associative on the live add set") {
    val logs = Seq(
      TxLog(Some(meta(0)), None, Seq(item(TxAction.Add, "a", 0), item(TxAction.Add, "b", 0)), Nil),
      TxLog(None, None, Seq(item(TxAction.Add, "c", 1)), Seq(item(TxAction.Remove, "a", 1))),
      TxLog(None, None, Seq(item(TxAction.Add, "d", 2)), Seq(item(TxAction.Remove, "c", 2))))
    val l = logs(0).coalesce(logs(1)).coalesce(logs(2))
    val r = logs(0).coalesce(logs(1).coalesce(logs(2)))
    assert(l.adds.flatMap(_.blobPath).toSet == Set("b", "d"))
    assert(l.adds.flatMap(_.blobPath).toSet == r.adds.flatMap(_.blobPath).toSet)
    assert(l.removes.flatMap(_.blobPath).toSet == r.removes.flatMap(_.blobPath).toSet)
  }

  test("coalesce keeps second's removes of pre-batch blobs (reference bug fixed)") {
    // TransactionLog.cs:101-102 drops second.Removes; a delete commit polled
    // together with an unrelated append must still delete.
    val first  = TxLog(Some(meta(5)), None, Seq(item(TxAction.Add, "new", 5)), Nil)
    val second = TxLog(None, None, Nil, Seq(item(TxAction.Remove, "old", 6)))
    val out = first.coalesce(second)
    assert(out.removes.flatMap(_.blobPath) == Seq("old"))
  }

  // ---- delta (J2) ---------------------------------------------------------

  test("delta reconstructs the checkpoint live set when applied to previous state") {
    check(Prop.forAll(pathsGen, pathsGen) { (prevPaths, curPaths) =>
      (prevPaths.nonEmpty && curPaths.nonEmpty) ==> {
        val prev = TxLog(Some(meta(0)), None, prevPaths.toSeq.map(item(TxAction.Add, _, 0, TxState.Done)), Nil)
        val cur  = TxLog(Some(meta(9)), None, curPaths.toSeq.map(item(TxAction.Add, _, 9)), Nil)
        cur.delta(prev) match {
          case None => prevPaths == curPaths
          case Some(d) =>
            val newAdds    = d.adds.flatMap(_.blobPath).toSet
            val newRemoves = d.removes.flatMap(_.blobPath).toSet
            newAdds == (curPaths -- prevPaths) &&
              newRemoves == (prevPaths -- curPaths) &&
              d.removes.forall(r => r.action == TxAction.Remove && r.state == TxState.Initial) &&
              ((prevPaths -- newRemoves) ++ newAdds) == curPaths
        }
      }
    })
  }

  test("delta hard-fails when a past remove is missing from the checkpoint") {
    val prev = TxLog(Some(meta(0)), None,
      Seq(item(TxAction.Add, "keep", 0, TxState.Done)),
      Seq(item(TxAction.Remove, "gone", 0, TxState.Done)))
    // checkpoint claims "gone" is still live (and keep too) — history lost
    val cur = TxLog(Some(meta(9)), None,
      Seq(item(TxAction.Add, "keep", 9), item(TxAction.Add, "gone", 9)), Nil)
    val e = intercept[IllegalStateException](cur.delta(prev))
    assert(e.getMessage.contains("Log-delta missing past removes"))
  }

  test("delta drops tombstones of never-applied blobs") {
    val prev = TxLog(Some(meta(0)), None, Seq(item(TxAction.Add, "a", 0, TxState.Done)), Nil)
    val cur = TxLog(Some(meta(9)), None,
      Seq(item(TxAction.Add, "a", 9)),
      Seq(item(TxAction.Remove, "ephemeral", 9))) // added+removed inside ckpt span
    assert(cur.delta(prev).isEmpty)
  }

  // ---- schema policy ------------------------------------------------------

  test("additive schema change allowed, retype and repartition refused") {
    val m0 = meta(0)
    val mAdd = meta(5, Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("extra", "STRING")))
    val mRetype = meta(5, Seq(ColumnSpec("id", "STRING")))
    val mRepart = meta(5, pcols = Seq("id"))
    val base = TxLog(Some(m0), None, Seq(item(TxAction.Add, "a", 0)), Nil)

    val ok = base.coalesce(TxLog(Some(mAdd), None, Seq(item(TxAction.Add, "b", 5)), Nil))
    assert(ok.metadata.get.schema.get.map(_.name) == Seq("id", "extra"))
    intercept[IllegalStateException](
      base.coalesce(TxLog(Some(mRetype), None, Seq(item(TxAction.Add, "b", 5)), Nil)))
    intercept[IllegalStateException](
      base.coalesce(TxLog(Some(mRepart), None, Seq(item(TxAction.Add, "b", 5)), Nil)))
  }

  // ---- last-wins dedup (A2) ----------------------------------------------

  test("lastWins keeps the latest state per item key in arrival order") {
    val a1 = item(TxAction.Add, "a", 0)
    val a2 = a1.withState(TxState.Done, T0.plusSeconds(60))
    val b  = item(TxAction.Add, "b", 0)
    val out = TxLog.lastWins(Seq(a1, b, a2))
    assert(out == Seq(a2, b))
  }
}
