package graft.functions

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.BottomKOps

/** Pure-algebra properties of the bottom-k sampling sketch buffer: any
  * partitioning + merge order must reproduce the flat build exactly —
  * the contract that makes the distributed two-level rollup (and the
  * streaming drain) deterministic.
  */
class BottomKPropSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def build(k: Int, vs: Seq[String]): BottomKOps.BkBuf = {
    val b = new BottomKOps.BkBuf(k)
    vs.foreach(v => b.insert(BottomKOps.md5Hex(v), v))
    b
  }

  private val valsGen =
    Gen.listOf(Gen.chooseNum(0, 400).map(i => s"v$i"))
  private val kGen = Gen.chooseNum(1, 12)

  test("split + merge at any cut equals the flat build; serde round-trips") {
    check(Prop.forAll(valsGen, kGen, Gen.chooseNum(0, 100)) { (vs, k, cutPct) =>
      val cut  = vs.size * cutPct / 100
      val flat = build(k, vs)
      val a    = build(k, vs.take(cut))
      val b    = build(k, vs.drop(cut))
      // merge in both orders, one side through the wire format
      val ab = build(k, vs.take(cut)); ab.mergeFrom(BottomKOps.fromBytes(BottomKOps.toBytes(b)))
      val ba = build(k, vs.drop(cut)); ba.mergeFrom(a)
      ab.m == flat.m && ba.m == flat.m &&
        flat.m.size == math.min(k, vs.distinct.size)
    })
  }

  test("the sample IS the k smallest hashes of the distinct domain") {
    check(Prop.forAll(valsGen, kGen) { (vs, k) =>
      val expect = vs.distinct.sortBy(BottomKOps.md5Hex).take(k)
      val got    = build(k, vs)
      import scala.jdk.CollectionConverters._
      got.m.values.asScala.toSeq == expect
    })
  }
}
