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

  test("branching pattern: two paths share a bound node variable") {
    val out = run(
      """datatable (s:string, d:string, w:long) [
        |   'a', 'b', 1, 'a', 'c', 2, 'a', 'd', 3, 'x', 'b', 9 ]
        | | make-graph s --> d
        | | graph-match (a)-[e1]->(b), (a)-[e2]->(c)
        |     where a.node_id == 'a' and e1.w < e2.w
        |     project b = b.node_id, c = c.node_id
        | | order by b asc, c asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // unordered pairs with w(e1) < w(e2), both edges out of 'a'
    assert(rows == Seq(("b", "c"), ("b", "d"), ("c", "d")))
  }

  test("cycle pattern: a repeated node variable closes the loop") {
    val out = run(
      """datatable (s:string, d:string) [
        |   'a', 'b', 'b', 'a', 'b', 'c', 'c', 'a' ]
        | | make-graph s --> d
        | | graph-match (x)-[e1]->(y)-[e2]->(x)
        |     project x = x.node_id, y = y.node_id
        | | order by x asc, y asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // 2-cycles: a→b→a and b→a→b (each orientation binds x once)
    assert(rows == Seq(("a", "b"), ("b", "a")))
  }

  test("three-hop cycle through a branch point") {
    val out = run(
      """datatable (s:string, d:string) [
        |   'a', 'b', 'b', 'c', 'c', 'a', 'b', 'z' ]
        | | make-graph s --> d
        | | graph-match (x)-[e1]->(y)-[e2]->(z)-[e3]->(x)
        |     where x.node_id == 'a'
        |     project y = y.node_id, z = z.node_id""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("b", "c")))
  }

  test("disconnected second path fails loudly") {
    val e = intercept[IllegalArgumentException](run(
      """datatable (s:string, d:string) [ 'a', 'b' ]
        | | make-graph s --> d
        | | graph-match (x)-[e1]->(y), (p)-[e2]->(q)
        |     project x = x.node_id""".stripMargin))
    assert(e.getMessage.contains("disconnected"))
  }

  test("repeated edge variable fails loudly") {
    val e = intercept[IllegalArgumentException](run(
      """datatable (s:string, d:string) [ 'a', 'b' ]
        | | make-graph s --> d
        | | graph-match (x)-[e]->(y)-[e]->(z)""".stripMargin))
    assert(e.getMessage.contains("edge variable"))
  }

  test("all()/any() collect a variable hop's edge values per branch") {
    val out = run(
      """datatable (s:string, d:string, w:long) [
        |   'a', 'b', 1, 'b', 'c', 2, 'a', 'd', 7 ]
        | | make-graph s --> d
        | | graph-match (x)-[e*1..2]->(y)
        |     where x.node_id == 'a'
        |     project dst = y.node_id, hops = e_hops,
        |       wsum = tolong(array_sum(all(e.w))),
        |       wmax = tolong(array_sum(any(e.w)))
        | | order by hops asc, dst asc""".stripMargin)
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // 1 hop: a→b (w 1), a→d (w 7); 2 hops: a→b→c (w 1+2)
    assert(rows == Seq(("b", 1L, 1L, 1L), ("d", 1L, 7L, 7L), ("c", 2L, 3L, 3L)))
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

  test("graph-shortest-paths keeps the minimum-hop level per pair") {
    // a→c directly (1 hop) AND via b (2 hops): only the 1-hop row survives;
    // a→d is reachable only at 2 hops via b
    val out = run(
      """datatable (s:string, d:string) [
        |   'a', 'b', 'b', 'c', 'a', 'c', 'b', 'd' ]
        | | make-graph s --> d
        | | graph-shortest-paths (x)-[e*1..3]->(y)
        |     where x.node_id == 'a'
        |     project dst = y.node_id, hops = e_hops
        | | order by dst asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("b", 1L), ("c", 1L), ("d", 2L)))
  }

  test("graph-shortest-paths output=any picks the lexicographically-min path") {
    // two 2-hop shortest paths a→z (via m1 and m2): any keeps the m1 path
    val out = run(
      """datatable (s:string, d:string) [
        |   'a', 'm1', 'a', 'm2', 'm1', 'z', 'm2', 'z' ]
        | | make-graph s --> d
        | | graph-shortest-paths (x)-[e*1..2]->(y)
        |     where x.node_id == 'a' and y.node_id == 'z'
        |     project p = strcat_array(e_path, '-')""".stripMargin)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a-m1-z"))
  }

  test("graph-shortest-paths output=all keeps every tied shortest path") {
    val out = run(
      """datatable (s:string, d:string) [
        |   'a', 'm1', 'a', 'm2', 'm1', 'z', 'm2', 'z' ]
        | | make-graph s --> d
        | | graph-shortest-paths output=all (x)-[e*1..2]->(y)
        |     where x.node_id == 'a' and y.node_id == 'z'
        |     project p = strcat_array(e_path, '-')
        | | order by p asc""".stripMargin)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a-m1-z", "a-m2-z"))
  }

  test("graph-shortest-paths surfaces genuine cycles as self-pairs") {
    val out = run(
      """datatable (s:string, d:string) [ 'a', 'b', 'b', 'a' ]
        | | make-graph s --> d
        | | graph-shortest-paths (x)-[e*1..4]->(y)
        |     where x.node_id == y.node_id
        |     project n = x.node_id, hops = e_hops
        | | order by n asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("a", 2L), ("b", 2L)))
  }

  test("graph-shortest-paths implicit nodes: NULL endpoints drop, literals stay verbatim") {
    // r17 advice (graph-match elision's twin): the explicit-node lowering
    // drops NULL endpoints via its id equi-joins; the implicit textual path
    // must reproduce the drops — an 'a'→NULL edge must not surface as a
    // dst=NULL pair. And aliasTx must never rewrite inside a string literal:
    // tag stays the literal text 'y.node_id', not a rewritten column name.
    val out = run(
      """datatable (s:string, d:string) [
        |   'a', 'b', 'b', 'c', 'a', null, null, 'b' ]
        | | make-graph s --> d
        | | graph-shortest-paths (x)-[e*1..2]->(y)
        |     where x.node_id == 'a'
        |     project dst = y.node_id, tag = 'y.node_id'
        | | order by dst asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("b", "y.node_id"), ("c", "y.node_id")))
  }

  test("graph-to-table materializes the node and edge sides") {
    val nodes = run(
      """datatable (s:string, d:string) [ 'a', 'b', 'b', 'c' ]
        | | make-graph s --> d
        | | graph-to-table nodes
        | | order by node_id asc""".stripMargin)
    assert(nodes.collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val edges = run(
      """datatable (s:string, d:string) [ 'a', 'b', 'b', 'c' ]
        | | make-graph s --> d
        | | graph-to-table edges
        | | order by s asc""".stripMargin)
    assert(edges.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("b", "c")))
  }

  test("graph-shortest-paths lo>1: shortest qualifying walk, sub-lo reach does not mask") {
    // a→c directly (1 hop) and via b (2 hops); with *2..3 the 1-hop reach
    // must NOT suppress the 2-hop qualifying walk. a→b qualifies only via
    // the 3-hop walk a→c? no edge c→b — so a→b (1 hop only) disappears.
    // d is first reachable at 2 (via b) — kept at 2.
    val out = run(
      """datatable (s:string, d:string) [
        |   'a', 'b', 'b', 'c', 'a', 'c', 'b', 'd' ]
        | | make-graph s --> d
        | | graph-shortest-paths (x)-[e*2..3]->(y)
        |     where x.node_id == 'a'
        |     project dst = y.node_id, hops = e_hops
        | | order by dst asc""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("c", 2L), ("d", 2L)))
    // cycle: with *2..4 a self-pair appears at its cycle length
    val cyc = run(
      """datatable (s:string, d:string) [ 'a', 'b', 'b', 'c', 'c', 'a' ]
        | | make-graph s --> d
        | | graph-shortest-paths (x)-[e*2..4]->(y)
        |     where x.node_id == 'a' and y.node_id == 'a'
        |     project hops = e_hops""".stripMargin)
    assert(cyc.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // bounds validation stays loud
    val e = intercept[IllegalArgumentException](run(
      """datatable (s:string, d:string) [ 'a', 'b' ]
        | | make-graph s --> d
        | | graph-shortest-paths (x)-[e*3..2]->(y)
        |     project n = x.node_id""".stripMargin))
    assert(e.getMessage.contains("1 <= lo <= hi"))
  }

  test("graph-mark-components: weak components ignore edge direction") {
    // two components: {1,2,3} (3->2 only reaches 2 backwards — weak) and
    // {7,8}; isolated node 9 rides in via the explicit node list
    val out = run(
      """let N = datatable (id:long) [ 1, 2, 3, 7, 8, 9 ];
        |datatable (s:long, d:long) [ 1, 2, 3, 2, 7, 8 ]
        | | make-graph s --> d with N on id
        | | graph-mark-components with_component_id = comp
        | | graph-to-table nodes
        | | order by id asc""".stripMargin)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L), (9L, 9L)))
  }

  test("graph-mark-components: long-chain component converges (pointer jumping)") {
    // a 60-node path has diameter 59 — far beyond the 25-round backstop of
    // plain min-label propagation; pointer jumping converges in ~log2(59)
    val edges = (1 until 60).map(i => s"$i, ${i + 1}").mkString(", ")
    val out = run(
      s"""datatable (s:long, d:long) [ $edges ]
         | | make-graph s --> d
         | | graph-mark-components with_component_id = comp
         | | graph-to-table nodes
         | | summarize n = count(), comps = count_distinct(comp), mn = min(comp)""".stripMargin)
    val r = out.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((60L, 1L, 1L)))
  }

  test("graph-mark-components: default column, kind=weak accepted, strong rejected") {
    val out = run(
      """datatable (s:string, d:string) [ 'x', 'y' ]
        | | make-graph s --> d
        | | graph-mark-components kind = weak
        | | graph-to-table nodes
        | | order by node_id asc""".stripMargin)
    assert(out.columns.toSeq == Seq("node_id", "ComponentId"))
    assert(out.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("x", "x"), ("y", "x")))
    val e = intercept[Exception](run(
      """datatable (s:string, d:string) [ 'x', 'y' ]
        | | make-graph s --> d
        | | graph-mark-components kind = strong
        | | graph-to-table nodes""".stripMargin))
    assert(e.getMessage.contains("kind=weak"))
  }
}
