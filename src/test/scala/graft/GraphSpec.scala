package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph
import graft.sources.Tables

class GraphSpec extends SparkSpec {

  test("pagerank: every nation ranked, mass conserved within floor loss, deterministic") {
    val df = Graph.nationTradePageRank(spark, sf).cache()
    val nations = Tables.nation(spark, sf).count()
    assert(df.count() === nations)
    val agg = df.agg(sum("units").as("s"), min("units").as("mn")).collect().head
    // initial mass is 1e9 nano-units; every iteration's floor divisions
    // (and any dangling node) only DROP mass, and the teleport base
    // restores 0.15 of it — total stays in (0.5e9, 1e9]
    assert(agg.getLong(0) <= 1000000000L)
    assert(agg.getLong(0) > 500000000L)
    // every node keeps at least its teleport base
    assert(agg.getLong(1) >= 150000000L / nations - 1)
    // integer arithmetic end to end: a second run is bit-identical
    val again = Graph.nationTradePageRank(spark, sf)
    assert(df.select("n_name", "units").collect().toSeq ===
      again.select("n_name", "units").collect().toSeq)
    // more iterations keep total order stable for the top node (sanity
    // that iteration actually propagates weight, not just the base)
    val one = Graph.nationTradePageRank(spark, sf, iters = 1)
      .agg(sum("units")).collect().head.getLong(0)
    assert(one <= 1000000000L && one > 500000000L)
    df.unpersist()
  }

  test("shortest paths: exact vs driver-side bounded Bellman-Ford, source at zero") {
    val df = Graph.boundedShortestPaths(spark, sf).cache()
    val rows = df.collect()
    // the source itself: cost 0, hops 0
    val src = rows.find(_.getString(0) == "NATION_0").get
    assert(src.getLong(1) === 0L && src.getInt(2) === 0)
    // independent reimplementation: collect the same edge list and run
    // the ≤4-hop DP in plain Scala — the engine must match it exactly
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val ew = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("a"), col("s_nationkey").as("b"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val mw = ew.map(_._3).max
    val edges = ew.map { case (a, b, w) => (a, b, mw + 1 - w) }
    var best = Map(0 -> ((0L, 0)))
    for (_ <- 1 to 4) {
      val relaxed = edges.flatMap { case (a, b, c) =>
        best.get(a).map { case (cost, hops) => b -> ((cost + c, hops + 1)) } }
      best = (best.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, vs) => n -> vs.map(_._2).min }
    }
    val names = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val expect = best.toSeq
      .map { case (n, (c, h)) => (names(n), c, h) }
      .sortBy { case (nm, c, _) => (c, nm) }
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
      === expect)
    // deterministic: integer costs end to end
    assert(rows.toSeq === Graph.boundedShortestPaths(spark, sf).collect().toSeq)
    df.unpersist()
  }

  test("triangles: node participation sums to 3T, deterministic") {
    val df = Graph.tradeTriangles(spark, sf).cache()
    assert(df.count() === Tables.nation(spark, sf).count())
    // every node's count is the number of triangles it sits in, so the
    // column total is exactly 3 × the triangle count — an integer
    // conservation law that catches any double-counted orientation
    val total = df.agg(sum("n_triangles")).collect().head.getLong(0)
    assert(total % 3 === 0)
    // integer arithmetic end to end: re-run is bit-identical
    assert(df.collect().toSeq ===
      Graph.tradeTriangles(spark, sf).collect().toSeq)
    df.unpersist()
  }

  test("communities: exact vs driver-side synchronous LPA replay, sizes consistent") {
    val df = Graph.tradeCommunities(spark, sf).cache()
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === Tables.nation(spark, sf).count())
    // community_size must equal the actual label multiplicity
    val mult = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (_, lbl, sz) => assert(sz === mult(lbl)) }
    // independent reimplementation: collect the same strong weighted
    // edge list and run Graph.lpaIters synchronous weighted-vote rounds
    // in plain Scala — tie-break (vote desc, label asc), absent voters
    // keep their label — the engine must match it exactly
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val und = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(least(col("c_nationkey"), col("s_nationkey")).as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("b"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2)))
    val sw = und.map(_._3).sum
    val ne = und.length.toLong
    val strong = und.filter { case (_, _, w) => w * ne > sw }
    val sym = strong.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val nodeIds = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0))
    var labels: Map[Long, Long] = nodeIds.map(n => n -> n).toMap
    for (_ <- 0 until Graph.lpaIters) {
      val votes = sym.groupBy(_._1).map { case (src, es) =>
        val byLbl = es.groupBy { case (_, dst, _) => labels(dst) }
          .view.mapValues(_.map(_._3).sum).toSeq
        src -> byLbl.minBy { case (lbl, vw) => (-vw, lbl) }._1
      }
      labels = labels.map { case (n, l) => n -> votes.getOrElse(n, l) }
    }
    rows.foreach { case (name, lbl, _) =>
      val node = name.stripPrefix("NATION_").toLong
      assert(lbl === labels(node), s"label mismatch for $name")
    }
    // determinism: re-run is bit-identical
    assert(df.collect().toSeq === Graph.tradeCommunities(spark, sf).collect().toSeq)
    df.unpersist()
  }

  test("graph: driver iteration fast path ≡ distributed loop, all four queries") {
    // maxDriverEdges = -1 forces the distributed path; MaxValue forces
    // the driver path — both must produce bit-identical frames (the
    // guard only chooses WHERE the exact integer recurrence runs)
    def both(f: Long => org.apache.spark.sql.DataFrame): Unit =
      assert(f(Long.MaxValue).collect().toSeq === f(-1L).collect().toSeq)
    both(g => Graph.nationTradePageRank(spark, sf, maxDriverEdges = g))
    both(g => Graph.boundedShortestPaths(spark, sf, maxDriverEdges = g))
    both(g => Graph.tradeTriangles(spark, sf, maxDriverEdges = g))
    both(g => Graph.tradeCommunities(spark, sf, maxDriverEdges = g))
  }
}
