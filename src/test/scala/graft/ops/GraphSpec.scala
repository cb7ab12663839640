package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class GraphSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  test("triangleCount: K4 has 4 triangles, K3 has 1, a path has 0") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(Graph.triangleCount(k4).collect().head.getLong(0) == 4L)

    val k3 = edges((1L, 2L), (1L, 3L), (2L, 3L))
    assert(Graph.triangleCount(k3).collect().head.getLong(0) == 1L)

    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    assert(Graph.triangleCount(path).collect().head.getLong(0) == 0L)
  }

  test("degree orientation keeps a star graph wedge-free (hub safety)") {
    // star: hub 100 with 8 leaves. Id-ordering would give the hub out-degree
    // 8 on the leaves above it and the wedge join would emit O(d^2) rows;
    // degree-ordering points every edge INTO the hub, so no vertex is both
    // a dst and a src and the wedge set is exactly empty.
    val star = edges((1 to 8).map(i => (i.toLong, 100L)): _*)
    val oriented = Graph.orientByDegree(star)
    assert(oriented.filter(org.apache.spark.sql.functions.col("dst") =!= 100L)
      .count() == 0, "every star edge must point into the hub")
    assert(Graph.orientedWedges(oriented).count() == 0L)
    assert(Graph.triangleCount(star).collect().head.getLong(0) == 0L)
  }

  test("degree ties break by vertex id and still count each triangle once") {
    // K3: all degrees equal (2), so orientation falls back to the id order
    // a<b — each edge keeps its canonical direction, exactly one wedge
    // (1→2→3) and one closing edge (1→3).
    val k3 = edges((1L, 2L), (1L, 3L), (2L, 3L))
    val oriented = Graph.orientByDegree(k3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oriented == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(Graph.orientedWedges(Graph.orientByDegree(k3)).count() == 1L)
  }

  test("mixed-degree orientation flips edges toward the higher-degree end") {
    // path 1-2-3 plus edge 2-4: vertex 2 has degree 3, others degree 1.
    // Every edge incident to 2 must point INTO 2 regardless of id order.
    val g = edges((1L, 2L), (2L, 3L), (2L, 4L))
    val oriented = Graph.orientByDegree(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oriented == Set((1L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("degrees counts both endpoints of every canonical edge") {
    val g = edges((1L, 2L), (1L, 3L))
    val d = Graph.degrees(g).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(d == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("precomputed-degrees overload matches the self-computing one") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L), (4L, 5L))
    val direct = Graph.triangleCount(g).collect().head.getLong(0)
    val shared = Graph.triangleCount(g, Graph.degrees(g)).collect().head.getLong(0)
    assert(direct == shared && direct == 2L)
  }

  test("pageRank: hand-checked path graph, exact integer ranks, mass conserved") {
    import spark.implicits._
    // undirected path 1—2—3, both directions: deg(1)=deg(3)=1, deg(2)=2
    val directed = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    // iter 1 by hand (S = 1e6): contrib(2) = 1e6 + 1e6; contrib(1) =
    // contrib(3) = 1e6 DIV 2 = 5e5; pr = (15e6 + 85*sc) DIV 100
    val r1 = Graph.pageRank(directed, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L), s"$r1")
    // symmetric graph: no dangling nodes, so total mass is exactly 3S
    assert(r1.values.sum == 3000000L)
    // more iterations keep the endpoint symmetry and the center's lead
    val r3 = Graph.pageRank(directed, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3(1L) == r3(3L) && r3(2L) > r3(1L))
    // determinism under repartitioning (integer sums are order-blind)
    val r3b = Graph.pageRank(directed.repartition(5), iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3b == r3)
  }

  /** Independent plain-Scala integer PageRank with dangling redistribution,
    * mirroring the documented arithmetic exactly. */
  private def refDanglingPr(es: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val deg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    var pr = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => pr(s) / deg(s) }.sum).toMap
      val dm = nodes.filterNot(deg.contains).map(pr).sum
      pr = nodes.map(v =>
        v -> (15L * scale + 85L * (contrib.getOrElse(v, 0L) + dm / n)) / 100L).toMap
    }
    pr
  }

  test("pageRank dangling redistribution conserves mass where the plain form leaks") {
    import spark.implicits._
    // chain 1→2→3 plus hub 1→4: nodes 3 and 4 are sinks holding most of
    // the mass after a round; 5 is a source-only node
    val es = Seq((1L, 2L), (2L, 3L), (1L, 4L), (5L, 1L))
    val directed = es.toDF("src", "dst")
    val scale = 1000000L
    val iters = 4

    val got = Graph.pageRank(directed, iters, scale,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refDanglingPr(es, iters, scale),
      s"engine=$got ref=${refDanglingPr(es, iters, scale)}")

    // conservation: total stays within integer-truncation distance of N·S
    // (< 1 lost per node per round from each of the two DIVs)
    val n = 5L
    val total = got.values.sum
    assert(total <= n * scale)
    assert(total >= n * scale - iters * 3 * n,
      s"redistributed total $total decayed past the truncation bound")

    // the plain form leaks the sink mass geometrically — far below bound
    val leaked = Graph.pageRank(directed, iters, scale)
      .collect().map(_.getLong(1)).sum
    assert(leaked < (n * scale * 8) / 10,
      s"expected >20% decay without redistribution, got $leaked / ${n * scale}")

    // determinism under repartitioning, as for the plain form
    val again = Graph.pageRank(directed.repartition(7), iters, scale,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }
}
