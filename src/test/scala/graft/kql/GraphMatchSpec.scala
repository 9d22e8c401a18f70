package graft.kql

import graft.SparkSuite

/** make-graph + graph-match: linear-path patterns lowered to join chains. */
class GraphMatchSpec extends SparkSuite {

  private def run(kql: String) = {
    spark.sparkContext
    KqlPipeline.run(Map.empty[String, org.apache.spark.sql.DataFrame], kql)
  }

  test("one-hop match with node properties and where/project") {
    val out = run(
      """let N = datatable (id:string, kind:string) [
        |   'a', 'person', 'b', 'person', 'c', 'city' ];
        |datatable (s:string, d:string, w:long) [
        |   'a', 'b', 1, 'b', 'c', 2, 'a', 'c', 3 ]
        | | make-graph s --> d with N on id
        | | graph-match (x)-[e]->(y)
        |     where y.kind == 'city'
        |     project src = x.id, dst = y.id, w = e.w
        | | order by src asc, w asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("a", "c", 3L), ("b", "c", 2L)))
  }

  test("two-hop match joins through the middle node") {
    val out = run(
      """let N = datatable (id:string, kind:string) [
        |   'a', 'person', 'b', 'person', 'c', 'city' ];
        |datatable (s:string, d:string, w:long) [
        |   'a', 'b', 1, 'b', 'c', 2, 'a', 'c', 3 ]
        | | make-graph s --> d with N on id
        | | graph-match (x)-[e1]->(y)-[e2]->(z)
        |     project path = strcat(x.id, '-', y.id, '-', z.id),
        |       total = e1.w + e2.w""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a-b-c", 3L)))
  }

  test("implicit nodes: distinct endpoints, node_id column") {
    val out = run(
      """datatable (s:long, d:long) [ 1, 2, 2, 3 ]
        | | make-graph s --> d
        | | graph-match (x)-[e]->(y)-[f]->(z)
        |     project a = x.node_id, b = y.node_id, c = z.node_id""".stripMargin)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 2L, 3L)))
  }

  test("variable-length hop unions the bounded expansions with a hops count") {
    val out = run(
      """datatable (s:string, d:string) [
        |   'a', 'b', 'b', 'c', 'a', 'd' ]
        | | make-graph s --> d
        | | graph-match (x)-[e*1..2]->(y)
        |     where x.node_id == 'a'
        |     project dst = y.node_id, hops = e_hops
        | | order by hops asc, dst asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 1 hop: a→b, a→d; 2 hops: a→b→c
    assert(rows == Seq(("b", 1L), ("d", 1L), ("c", 2L)))
  }

  test("variable-length hop composes with fixed hops and edge predicates") {
    val out = run(
      """let N = datatable (id:string, kind:string) [
        |   'a', 'src', 'b', 'mid', 'c', 'mid', 'z', 'sink' ];
        |datatable (s:string, d:string, w:long) [
        |   'a', 'b', 1, 'b', 'c', 1, 'c', 'z', 5, 'b', 'z', 5 ]
        | | make-graph s --> d with N on id
        | | graph-match (x)-[e*1..3]->(y)-[last]->(z)
        |     where x.kind == 'src' and z.kind == 'sink' and last.w == 5
        |     project dst = z.id, hops = e_hops
        | | order by hops asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // a→b then b→z (1 var hop); a→b→c then c→z (2 var hops)
    assert(rows == Seq(("z", 1L), ("z", 2L)))
  }

  test("variable-length hop without an explicit project fails loudly") {
    intercept[IllegalArgumentException](run(
      """datatable (s:string, d:string) [ 'a', 'b' ]
        | | make-graph s --> d
        | | graph-match (x)-[e*1..2]->(y)""".stripMargin))
  }

  test("graph-match without make-graph fails loudly") {
    val e = intercept[IllegalArgumentException](run(
      """datatable (s:long, d:long) [ 1, 2 ]
        | | graph-match (x)-[e]->(y)""".stripMargin))
    assert(e.getMessage.contains("make-graph"))
  }
}
