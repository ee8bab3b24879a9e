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
}
