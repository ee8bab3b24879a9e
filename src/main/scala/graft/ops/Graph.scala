package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph analytics over relationships mined from the fact
  * tables — the capability family (alongside the connected-components
  * contraction in [[Dedup]]) a 100 TB training-data pipeline needs for
  * influence/importance ranking over entity graphs (source domains,
  * citation links, user interaction graphs).
  *
  * Reference scope note: the reference (`src/main.py:7-48`) has no graph
  * surface; this pack is part of the extended large-scale mandate, like
  * dedup/similarity/text.
  */
object Graph {

  /** Weighted PageRank over the nation trade graph, in EXACT integer
    * arithmetic for cross-engine value parity.
    *
    * Graph: one directed edge customer-nation → supplier-nation per
    * trading pair, weighted by the number of lineitems shipped between
    * them (mined from lineitem ⨝ orders ⨝ customer ⨝ supplier — the
    * expensive part of the query and the part that scales with the
    * corpus; the rank iteration state is O(nodes)).
    *
    * Arithmetic: ranks live in integer NANO-UNITS (Σ initial = 1e9).
    * Each of the `iters` power-iteration steps computes
    * `contrib(u→v) = (units_u · w_uv · 85) div (100 · out_w_u)` and
    * `units'_v = (150000000 div n) + Σ contrib` — all `div` is exact
    * integer division, so summation order CANNOT change the result and
    * the DuckDB twin (same unrolled arithmetic as chained CTEs) matches
    * bit-for-bit. Floor remainders dissipate a tiny amount of mass per
    * step (documented, deterministic); dangling nodes (no out-edges)
    * likewise drop their damped mass — the standard simplification.
    * Overflow headroom: units ≤ 1e9 and edge weights up to ~1e8 keep
    * `units·w·85` under 2^63; corpora beyond that pre-normalize weights.
    *
    * Scale shape: ONE pass over the fact table builds the edge list
    * (lineitem shuffles on orderkey for the orders join; the linearly
    * growing customer/supplier dims join under size-guarded
    * [[Hints.dimHint]] — hinted while they fit, shuffled sort-merge once
    * they don't), which is then `localCheckpoint`ed — O(nations²) rows —
    * so the 5 iterations are tiny broadcast joins, never a re-read of
    * the fact table. At web-graph scale the same plan shape runs with
    * ranks and edges both partitioned by node id. */
  def nationTradePageRank(spark: SparkSession, dir: String,
                          iters: Int = 5): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val edges0 = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Hints.dimHint(cust), col("o_custkey") === col("c_custkey"))
      .join(Hints.dimHint(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = edges0.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    // O(nations²) rows after the one fact pass — pin so 5 iterations
    // re-read this, never the fact join (same pattern as the dedup
    // contraction's edge set)
    val edges = edges0.join(outw, "src").localCheckpoint()

    val nation = Tables.nation(spark, dir)
    val n1 = nation.agg(count(lit(1)).as("n"))
    val nodes = nation.select(col("n_nationkey").as("node"), col("n_name"))
      .crossJoin(broadcast(n1))

    val r0 = nodes.select(col("node"), expr("1000000000L div n").as("units"))
    val ranks = (1 to iters).foldLeft(r0) { (r, _) =>
      val contrib = broadcast(edges)
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("(units * w * 85L) div (100L * out_w)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (expr("150000000L div n") + coalesce(col("contrib"), lit(0L)))
            .as("units"))
    }
    nodes.join(ranks, "node")
      .select(col("n_name"), col("units"),
        (col("units") / 1000000000.0).as("pagerank"))
      .orderBy(col("units").desc, col("n_name"))
  }

  /** Bounded-hop cheapest trade routes from one source nation — the
    * itinerary-style shortest-path screen (Bellman-Ford relaxation,
    * bounded to `maxHops` edges so the semantics are "cheapest route
    * using at most k legs", exactly the walk set a bounded recursive
    * CTE enumerates — which is the DuckDB twin).
    *
    * Graph: directed trade edges (customer-nation → supplier-nation,
    * self-loops dropped), edge cost = `maxW + 1 − w` in EXACT integers —
    * heavier trade ⇒ cheaper leg — so no float compare can diverge
    * cross-engine. Per node the result is the lexicographically minimal
    * `(cost, hops)` over all ≤k-leg walks: both components are additive
    * and monotone, so the per-hop DP (extend last round's minimum, fold
    * with `min(struct(cost, hops))`) is exact — a walk through `u`
    * can never beat extending `u`'s own minimum.
    *
    * Scale shape: ONE fact pass builds the edge list (dimensions
    * under size-guarded hints, one shuffle), localCheckpoint'd at
    * O(nations²) rows; the
    * k relaxation rounds are tiny broadcast joins against the O(nodes)
    * distance frame. At web scale the same plan runs with both sides
    * hash-partitioned on node id and the frontier-only refinement
    * (relax only nodes improved last round). */
  def boundedShortestPaths(spark: SparkSession, dir: String,
                           sourceKey: Int = 0, maxHops: Int = 4): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val edges0 = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Hints.dimHint(cust), col("o_custkey") === col("c_custkey"))
      .join(Hints.dimHint(supp), col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val mx = edges0.agg(max(col("w")).as("mw"))
    val edges = edges0.crossJoin(broadcast(mx))
      .select(col("src"), col("dst"), (col("mw") + 1L - col("w")).as("ecost"))
      .localCheckpoint()

    import spark.implicits._
    val d0 = Seq((sourceKey, 0L, 0)).toDF("node", "cost", "hops")
    val dist = (1 to maxHops).foldLeft(d0) { (d, _) =>
      val relaxed = edges
        .join(broadcast(d.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"), (col("cost") + col("ecost")).as("cost"),
          (col("hops") + 1).as("hops"))
      d.union(relaxed)
        .groupBy(col("node"))
        .agg(min(struct(col("cost"), col("hops"))).as("m"))
        .select(col("node"), col("m.cost").as("cost"), col("m.hops").as("hops"))
    }
    Tables.nation(spark, dir)
      .join(broadcast(dist), col("n_nationkey") === col("node"))
      .select(col("n_name"), col("cost"), col("hops"))
      .orderBy(col("cost"), col("n_name"))
  }

  /** Per-nation triangle participation over the STRONG trade graph —
    * the clustering-structure screen (triangles are the unit of
    * transitivity; a node's triangle count is the numerator of its local
    * clustering coefficient, Watts & Strogatz 1998).
    *
    * Graph: undirected trade edges (merged both directions, self-loops
    * dropped), thresholded to above-average total weight — the
    * integer-exact cut `w·|E| > Σw`, so the complete K₂₅ at test scale
    * becomes a genuine subgraph and no float compare can diverge
    * cross-engine.
    *
    * Scale shape: one fact pass builds the edge list (the only
    * corpus-sized work — cust/supp dims under size-guarded hints, one
    * shuffle);
    * the thresholded edge set is localCheckpoint'd and triangle
    * enumeration is two self-joins on the CANONICAL orientation a<b<c,
    * so each triangle is counted exactly once and the join fan-out is
    * bounded by the oriented degree (at web scale the standard
    * degree-ordering refinement assigns each edge its lower-degree
    * endpoint first — same plan shape). */
  def tradeTriangles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val und = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Hints.dimHint(cust), col("o_custkey") === col("c_custkey"))
      .join(Hints.dimHint(supp), col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(least(col("c_nationkey"), col("s_nationkey")).as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
      .agg(count(lit(1)).as("w"))
    val tot = und.agg(count(lit(1)).as("ne"), sum(col("w")).as("sw"))
    val strong = und.crossJoin(broadcast(tot))
      .where(col("w") * col("ne") > col("sw"))
      .select(col("a"), col("b"))
      .localCheckpoint()
    val tri = strong
      .join(strong.select(col("a").as("b"), col("b").as("c")), "b")
      .join(strong.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    Tables.nation(spark, dir)
      .join(perNode, col("n_nationkey") === col("node"), "left")
      .select(col("n_name"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("n_name"))
  }

  /** Fixed LPA round count — shared with the generated DuckDB twin
    * (one unrolled CTE pair per round). */
  val lpaIters = 4

  /** Label-propagation communities (Raghavan, Albert & Kumara, Phys.
    * Rev. E 2007) over the strong trade graph — the near-linear-time
    * community detector every graph stack ships (GraphFrames/GraphX
    * `labelPropagation`). DETERMINISTIC variant: SYNCHRONOUS rounds
    * (the classic async sweep is visit-order-dependent — unusable as a
    * cross-engine contract), weighted neighbour vote (edge weight =
    * trade volume), tie-break (vote weight desc, label asc), a FIXED
    * [[lpaIters]] rounds rather than a convergence test, and isolated
    * nodes keep their own label. Labels init to the node id.
    *
    * Graph: the same integer-exact above-average-weight edge cut as
    * [[tradeTriangles]] (shared builder semantics, weights kept).
    *
    * Scale shape: per round ONE join of the edge list against the
    * (node, label) frame and one (node, label) group-by — both
    * partition by node id; no per-node adjacency materialization, no
    * driver state. Rounds localCheckpoint the label frame so the plan
    * does not grow 4× (the [[nationTradePageRank]] discipline). */
  def tradeCommunities(spark: SparkSession, dir: String,
                       iters: Int = lpaIters): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val und = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Hints.dimHint(cust), col("o_custkey") === col("c_custkey"))
      .join(Hints.dimHint(supp), col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(least(col("c_nationkey"), col("s_nationkey")).as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
      .agg(count(lit(1)).as("w"))
    val tot = und.agg(count(lit(1)).as("ne"), sum(col("w")).as("sw"))
    val strong = und.crossJoin(broadcast(tot))
      .where(col("w") * col("ne") > col("sw"))
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"),
        col("w"))
      .localCheckpoint()
    val sym = strong.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .union(strong.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val nodes = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    var labels = nodes.select(col("node"), col("node").as("lbl"))
    for (_ <- 0 until iters) {
      val votes = sym
        .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .groupBy(col("src"), col("lbl")).agg(sum(col("w")).as("vw"))
      val best = votes
        .withColumn("r", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("vw").desc, col("lbl"))))
        .where(col("r") === 1)
        .select(col("src").as("node"), col("lbl").as("new_lbl"))
      labels = labels.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("community_size"))
    nodes.join(labels, "node").join(sizes, "lbl")
      .select(col("n_name"), col("lbl").as("community"),
        col("community_size"))
      .orderBy(col("n_name"))
  }
}
