package graft.functions.expressions

import org.scalatest.funsuite.AnyFunSuite

/** Unit-level contracts for the round-12 straggler natives. The
  * oracle-gated pins live in q_kql_dynamic_stragglers /
  * q_kql_geo_stragglers / q_kql_buildschema; this spec exercises the
  * algebra directly (id arithmetic round-trips, merge commutativity,
  * traversal dedup) where the one-row oracle pins can't sweep.
  */
class StragglerExprSpec extends AnyFunSuite {

  test("S2 parent/children id algebra: round-trips at every level, all faces") {
    for (lng <- Seq(-170.0, -45.0, 0.0, 60.0, 179.0); lat <- Seq(-80.0, -10.0, 0.0, 45.0, 80.0)) {
      for (level <- Seq(1, 5, 12, 20, 29)) {
        val id = S2Cell.cellId(lng, lat, level)
        assert(S2Cell.levelOf(id) == level, s"level of $lng,$lat@$level")
        // every child's parent is the cell; the point's own finer cell is
        // among the children
        val kids = S2Cell.childIds(id)
        assert(kids.length == 4 && kids.distinct.length == 4)
        kids.foreach { k =>
          assert(S2Cell.levelOf(k) == level + 1)
          assert(S2Cell.parentId(k, level) == id, s"parent of child @$level")
        }
        assert(kids.contains(S2Cell.cellId(lng, lat, level + 1)))
        // parent at a coarser level equals the point's own coarser cell
        assert(S2Cell.parentId(id, level - 1) == S2Cell.cellId(lng, lat, level - 1))
      }
    }
  }

  test("treepath: ADX bracket spelling, [] once per array, dedup across elements") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    def run(json: String): Seq[String] = {
      val r = TreePath(Literal(UTF8String.fromString(json),
        org.apache.spark.sql.types.StringType)).eval(null)
      if (r == null) null
      else r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    }
    assert(run("""{"a":{"b":1,"c":[5,{"d":2}]}}""") ==
      Seq("['a']", "['a']['b']", "['a']['c']", "['a']['c'][]", "['a']['c'][]['d']"))
    // same-keyed array elements contribute ONE path set
    assert(run("""{"l":[{"k":1},{"k":2},{"k":3}]}""") ==
      Seq("['l']", "['l'][]", "['l'][]['k']"))
    assert(run("42") == Seq.empty, "scalar root: empty, not null")
    assert(run("{nope") == null, "malformed: null")
  }

  test("buildschema tree: merge is commutative and dedups options") {
    def tree(jsons: String*): SchemaTree.Node = {
      val n = new SchemaTree.Node
      jsons.foreach(j => SchemaTree.fromJson(SchemaTree.parse(j), n))
      n
    }
    val ab = SchemaTree.toJson(tree("""{"a":{"b":1}}""", """{"a":true}""")).toString
    val ba = SchemaTree.toJson(tree("""{"a":true}""", """{"a":{"b":1}}""")).toString
    assert(ab == ba, "order-independent")
    assert(ab == """{"a":["bool",{"b":"long"}]}""")
    // array spelling + idempotence
    val arr = SchemaTree.toJson(tree("""{"x":[1,2]}""", """{"x":[3]}""")).toString
    assert(arr == """{"x":{"`indexer`":"long"}}""")
  }

  test("geo_union_lines_array: verbatim coordinates, type split, null guard") {
    val l1 = (Array(0.0, 2.0), Array(0.0, 0.0))
    val l2 = (Array(10.0, 10.0, 11.0), Array(10.0, 12.0, 12.0))
    assert(GeoClip.unionLinesArray(Seq(l1)) ==
      """{"type":"LineString","coordinates":[[0.0,0.0],[2.0,0.0]]}""")
    val multi = GeoClip.unionLinesArray(Seq(l1, l2))
    assert(multi.startsWith("""{"type":"MultiLineString""") && multi.contains("[11.0,12.0]"))
    assert(GeoClip.unionLinesArray(Seq((Array(0.0), Array(0.0)))) == null, "1-point line")
    assert(GeoClip.unionLinesArray(Seq.empty).contains("GeometryCollection"))
  }
}
