package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over an edge table — the pieces a
  * training-data pipeline needs for co-occurrence graphs (parts sharing an
  * order, docs sharing a shingle): degrees, wedges, exact triangle counts.
  *
  * Triangle counting uses the standard *degree-ordered* oriented-edge
  * formulation: orient every undirected edge from its lower-(degree, id)
  * endpoint to its higher one. The orientation is a total order, so each
  * triangle {u,v,w} contributes exactly one directed wedge u→v→w plus the
  * closing edge u→w, and the count is a pure 3-way equi-join. Ordering by
  * degree (not id) caps every vertex's out-degree at O(√m): a hub with d
  * neighbors keeps only its higher-(degree,id) neighbors as out-edges, so
  * the wedge join generates O(Σ outdeg²) = O(m^1.5) rows worst-case
  * instead of the O(d²) per-hub blowup an id-ordering suffers on skewed
  * graphs (the co-purchase graph is exactly that shape at 100 TB).
  */
object Graph {

  /** Canonical undirected edges (a < b, distinct) → degree per vertex. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("v"))
      .union(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

  /** Re-orient canonical (a < b) undirected edges by (degree, id): each
    * edge points from its lower-(d, v) endpoint to its higher one.
    * Output columns: (src, dst). Two shuffled equi-joins against the
    * degree table — no driver traffic, no per-vertex adjacency lists. */
  def orientByDegree(edges: DataFrame): DataFrame =
    orientByDegree(edges, degrees(edges))

  /** Same, against a caller-supplied degree table (columns v, d) so a query
    * that also reports degree stats builds ONE degree subtree — identical
    * subtrees let ReuseExchange serve every consumer from one shuffle. */
  def orientByDegree(edges: DataFrame, deg: DataFrame): DataFrame = {
    edges
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
  }

  /** Directed wedges src→mid→dst of a degree-oriented edge set — the
    * candidate set the triangle join closes. Exposed so specs can pin the
    * hub-safety property: on a star graph this is empty (all star edges
    * point *into* the hub), where an id-ordering can emit O(d²) rows. */
  def orientedWedges(oriented: DataFrame): DataFrame =
    oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"),
        col("e2.dst").as("w"))

  /** Exact triangle count: close each oriented wedge with the (u, w)
    * oriented edge. All equi-joins; per-vertex work bounded by the
    * degree orientation. */
  def triangleCount(edges: DataFrame): DataFrame =
    triangleCount(edges, degrees(edges))

  /** Same, reusing a caller-supplied degree table (see [[orientByDegree]]).
    *
    * The oriented edge set feeds three join legs on three different keys
    * (dst, src, (src, dst)), so without materialization the two degree
    * joins recompute three times. A lazy [[Lineage.invariant]] cut stores
    * the oriented edges on first use and serves the other two legs from it
    * — non-replicated blocks by default, a reliable checkpoint when the
    * session has a checkpoint dir (the durable mode for lost-executor
    * survival on long cluster runs). */
  def triangleCount(edges: DataFrame, deg: DataFrame): DataFrame =
    triangleCount(edges, deg, statePartitions = 0)

  /** Same, with an explicit partition count for the oriented-edge state
    * (plain hash repartition on src before the lineage cut). What this is
    * FOR: spreading an under-partitioned upstream — a scan of a few large
    * files, or a coalesced prior stage — across a cluster's executors so
    * the cached state and the join tasks sized off it don't pile onto a
    * handful of block managers. What it is NOT: a single-box memory fix.
    * The 32× drill (~58M oriented edges, 24g box) measured the knob at
    * P=256 COUNTERPRODUCTIVE — ratio 21.9 vs 14.1 with it off — because
    * the ceiling is the TOTAL cached bytes of the state, which
    * repartitioning does not change; the knob only adds one full |E|-row
    * exchange (and src-hashing concentrates high-degree vertices). On one
    * box the state is the data: size the box (or let the MEMORY_AND_DISK
    * cut spill, which is what the drill's 14.1 ratio already includes);
    * on a cluster, size executors so aggregate storage memory covers the
    * oriented-edge cut (|E| rows at UnsafeRow width for two longs, plus
    * per-block overhead).
    * 0 = off (inherit upstream partitioning, the default and lint-pinned
    * shape). */
  def triangleCount(edges: DataFrame, deg: DataFrame,
      statePartitions: Int): DataFrame = {
    val lin = new Lineage(edges.sparkSession)
    val base = orientByDegree(edges, deg)
    val sized =
      if (statePartitions > 0) base.repartition(statePartitions, col("src"))
      else base
    val oriented = lin.invariant(sized, eager = false)
    orientedWedges(oriented).as("wg")
      .join(oriented.as("e3"),
        col("wg.u") === col("e3.src") && col("wg.w") === col("e3.dst"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Integer fixed-point PageRank over DIRECTED `(src, dst)` edges —
    * damping 0.85, ranks scaled by `scale` and computed entirely in Long
    * arithmetic (`pr DIV deg`, `(0.15·scale·100 + 85·Σcontrib) DIV 100`),
    * so the result is order-independent and bit-identical across engines:
    * float PageRank can never pass a cross-engine hash gate, this can.
    * Cf. Page et al., "The PageRank citation ranking" (1999).
    *
    * Scale shape: the (edge ⋈ out-degree) relation is iteration-invariant
    * and materialized ONCE; each iteration is then one equi-join on src
    * plus one map-side-combined sum keyed by dst. Rank lineage is cut
    * every other round via [[Lineage.state]] — iteration count is fixed by
    * the caller, so total work is O(iters · |E|) with no driver-side data
    * movement. Lineage cuts are non-replicated `localCheckpoint` blocks by
    * default; when the session has a checkpoint dir configured
    * (`sc.setCheckpointDir`) the cuts go DURABLE — persisted-with-lineage
    * rounds plus a reliable checkpoint every few cuts — so an hours-long
    * cluster run survives executor loss (see [[Lineage]]).
    *
    * Dangling nodes (no out-edges): with `redistributeDangling = false`
    * their mass simply leaks each round — harmless on symmetric edge sets
    * (none exist) but wrong on real directed link graphs, where sinks can
    * hold most of the mass. `redistributeDangling = true` adds the standard
    * uniform redistribution term (Page et al. §2.7): each round the summed
    * rank of the (iteration-invariant, materialized-once) dangling node set
    * — ONE extra 1-row aggregate, broadcast back into the update — is split
    * `DIV`-evenly across all N nodes, still pure Long arithmetic. Total
    * mass is then conserved up to integer truncation (< 1 per node per
    * round from each `DIV`), instead of decaying by the dangling share. */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000L,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(scale >= 100, s"scale must be >= 100 for the integer damping: $scale")
    val lin = new Lineage(edges.sparkSession)
    // Cut the caller's edge derivation ONCE before the setup fan-out: the
    // out-degree aggregate, the edge⋈degree invariant, both branches of
    // the node-set union and the dangling anti-join all consume `edges`,
    // and each is an independent plan subtree — an expensive derivation
    // (q98 feeds a lineitem self-join + distinct through here) would
    // otherwise run four-plus times during setup. Lazy, so the first
    // eager invariant below pays the one computation and every other
    // consumer reads the stored (src, dst) pairs.
    val e = lin.invariant(edges, eager = false)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = lin.invariant(e.join(outDeg, "src"))
    val nodes = lin.invariant(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val dangling =
      if (redistributeDangling)
        lin.invariant(
          nodes.join(e.select(col("src").as("node")).distinct(),
            Seq("node"), "left_anti"))
      else null
    val nNodes = if (redistributeDangling) nodes.count() else 0L
    var pr = nodes.withColumn("pr", lit(scale))
    for (i <- 1 to iters) {
      val contrib = withDeg
        .join(pr, col("src") === col("node"))
        .select(col("dst"), expr("pr DIV deg").as("c"))
        .groupBy("dst").agg(sum("c").as("sc"))
      val base = nodes.join(contrib, col("node") === col("dst"), "left")
      pr =
        if (redistributeDangling) {
          // 1-row dangling-mass aggregate, broadcast into every row
          val dmass = pr.join(dangling, Seq("node"), "left_semi")
            .agg(coalesce(sum("pr"), lit(0L)).as("dm"))
          base.crossJoin(broadcast(dmass))
            .select(col("node"),
              expr(s"(${15L * scale} + 85 * (coalesce(sc, 0L) + dm DIV $nNodes)) DIV 100")
                .as("pr"))
        } else
          base.select(col("node"),
            expr(s"(${15L * scale} + 85 * coalesce(sc, 0L)) DIV 100").as("pr"))
      if (i % 2 == 0) pr = lin.state(pr, eager = true)
    }
    pr
  }
}
