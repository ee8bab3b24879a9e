package graft

import org.apache.spark.sql.functions._

import graft.explore.Stats
import graft.sources.Tables

class StatsSpec extends SparkSpec {

  test("corr stats: correlation in [-1,1], stddev positive") {
    val r = Stats.corrStats(spark, sf).collect().head
    assert(r.getAs[Long]("n") === Tables.lineitem(spark, sf).count())
    assert(math.abs(r.getAs[Double]("corr_price_disc")) <= 1.0)
    assert(r.getAs[Double]("sd_price") > 0)
  }

  test("corr matrix: symmetric with unit diagonal") {
    val m = Stats.corrMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("r")).toMap
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.foreach(c => assert(math.abs(m((c, c)) - 1.0) < 1e-6))
    for (x <- cols; y <- cols)
      assert(math.abs(m((x, y)) - m((y, x))) < 1e-9)
  }

  test("kde: densities positive, integrate roughly to 1 over the support") {
    val dens = Stats.kdeDensity(spark, sf, "l_discount", bandwidth = 0.02, points = 21)
      .collect().map(_.getAs[Double]("density"))
    assert(dens.length === 21)
    assert(dens.forall(_ >= 0.0))
    // trapezoid integral over [min,max] of a density ≈ 1 (edges lose mass)
    val bounds = Tables.lineitem(spark, sf)
      .agg(min(col("l_discount")), max(col("l_discount"))).head
    val step = (bounds.getDouble(1) - bounds.getDouble(0)) / 20
    val integral = dens.sliding(2).map(p => (p(0) + p(1)) / 2 * step).sum
    assert(integral > 0.7 && integral < 1.2, s"integral $integral")
  }

  test("histogram: buckets in range, counts sum to row count") {
    val rows = Stats.histogram(spark, sf).collect()
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 19
    })
    assert(rows.map(_.getAs[Long]("n")).sum === Tables.lineitem(spark, sf).count())
  }

  test("fused 20-column histogram: every feature covered, parity with a recompute") {
    val n = 2000L
    val buckets = 10
    val rows = Stats.featureHistograms(spark, n, buckets).collect()
    val byFeature = rows.groupBy(_.getAs[String]("feature"))
    // R15 breadth: all 20 feature columns in one result, each complete
    assert(byFeature.keySet ===
      (0 until graft.datagen.SyntheticFeatures.numFeatures)
        .map(i => s"feature_$i").toSet)
    byFeature.foreach { case (f, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum === n, f)
      assert(rs.forall { r =>
        val b = r.getAs[Long]("bucket"); b >= 0 && b < buckets
      }, f)
    }
    // per-column parity: the fused pass must equal an independent
    // driver-side recompute of the same clamped equi-width bucketing
    val data = graft.datagen.SyntheticFeatures.generate(spark, n).collect()
    Seq("feature_0", "feature_7", "feature_19").foreach { f =>
      val xs = data.map(_.getAs[Double](f))
      val (mn, mx) = (xs.min, xs.max)
      val w = (mx - mn) / buckets
      val expect = xs.map { x =>
        if (w == 0.0) 0L
        else math.min(math.floor((x - mn) / w).toLong, (buckets - 1).toLong)
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val got = byFeature(f)
        .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
      assert(got === expect, f)
    }
  }

  test("fused 20-column KDE: every feature on its grid, parity with a recompute, integral ≈ 1") {
    val n = 2000L
    val points = 11
    val rows = Stats.featureKde(spark, n, points).collect()
    val byFeature = rows.groupBy(_.getAs[String]("feature"))
    assert(byFeature.keySet ===
      (0 until graft.datagen.SyntheticFeatures.numFeatures)
        .map(i => s"feature_$i").toSet)
    byFeature.values.foreach(rs => assert(rs.length === points))
    val data = graft.datagen.SyntheticFeatures.generate(spark, n).collect()
    Seq("feature_0", "feature_7", "feature_19").foreach { f =>
      val xs = data.map(_.getAs[Double](f))
      val (mn, mx) = (xs.min, xs.max)
      val h = 1.06 * stddevSamp(xs) * math.pow(n.toDouble, -0.2)
      val norm = 1.0 / (h * math.sqrt(2.0 * math.Pi))
      val got = byFeature(f).sortBy(_.getAs[Double]("pt"))
      (0 until points).foreach { j =>
        val pt = mn + (mx - mn) * j / (points - 1).toDouble
        val expect = xs.map(x =>
          math.exp(-(x - pt) * (x - pt) / (2 * h * h)) * norm).sum / n
        assert(math.abs(got(j).getAs[Double]("density") - expect) < 1e-4,
          s"$f pt$j")
      }
      // trapezoid integral over the grid ≈ 1 (minus the Gaussian tails
      // beyond [mn, mx] and grid discretization)
      val pts = got.map(_.getAs[Double]("pt"))
      val ds = got.map(_.getAs[Double]("density"))
      val integral = (1 until points).map(j =>
        (pts(j) - pts(j - 1)) * (ds(j) + ds(j - 1)) / 2).sum
      assert(integral > 0.7 && integral < 1.1, s"$f integral=$integral")
    }
  }

  private def stddevSamp(xs: Array[Double]): Double = {
    val m = xs.sum / xs.length
    math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
  }

  test("fused 20-column KDE is ONE grouped aggregation, codegen'd, no cartesian") {
    val df = Stats.featureKde(spark, 1000, 11)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    // examine the FINAL adaptive plan only (the initial-plan section
    // repeats every node with fresh plan_ids)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), p)
    // exactly one hash exchange (the per-feature density agg, 20 groups);
    // the bounds frame arrives broadcast
    val hashEx = "Exchange hashpartitioning[^\\[]*\\[plan_id=(\\d+)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSet.size
    assert(hashEx === 1, p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"), p)
    // the density aggregate stays inside whole-stage codegen (the `*(n)`
    // span markers) — a cols×points keyless-buffer variant exceeded
    // codegen maxFields and fell back to interpreted evaluation
    // (measured 9.4 s vs ~1.7 s for this shape)
    assert(p.contains("HashAggregate") && p.contains("*("), p)
  }

  test("fused 20-column histogram is ONE aggregation job, not 20 scans") {
    val df = Stats.featureHistograms(spark, 1000, 10)
    val p = df.queryExecution.executedPlan.toString
    // one group-count exchange (the (feature, bucket) agg); the bounds agg
    // is a single-row broadcast, the final order is the range exchange
    assert(!p.contains("CartesianProduct"), p)
    val hashEx = p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx === 1, p)
  }

  test("skew profile: top keys equal a full-sort recompute, no window in plan") {
    val out = Stats.keySkewProfile(spark, sf).collect()
    assert(out.map(_.getAs[Long]("rnk")).toSeq === (1L to 10L))
    val counts = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val top = counts.sortBy { case (k, c) => (-c, k) }.take(10)
    assert(out.map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("cnt"))).toSeq
      === top.toSeq)
    val mx = counts.map(_._2).max.toDouble
    val av = counts.map(_._2).sum.toDouble / counts.length
    assert(math.abs(out.head.getAs[Double]("skew_factor") -
      math.floor(mx / av * 10000 + 0.5) / 10000) < 1e-9)
    val p = Stats.keySkewProfile(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
  }

  test("column profile: one row per column, typed min/max, recompute parity") {
    // TWO scans exactly: the min/max/count pass and the shared-Expand
    // distinct pass — never a per-column re-scan union, and no sort
    // under the Expand (the SortAggregate-under-Expand shape measured
    // 3.8 s at sf0.1). Asserted BEFORE caching (a cached plan string
    // duplicates the tree).
    val p = Stats.columnProfile(spark, sf).queryExecution.executedPlan.toString
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") === 2, p)
    // one Sort node only — the presentation order. A keyless
    // SortAggregate sorts nothing; the harmful shape was a KEYED sort
    // under the distinct Expand, which would add a second Sort here.
    assert(p.sliding("Sort [".length).count(_ == "Sort [") === 1, p)
    val df = Stats.columnProfile(spark, sf).cache()
    val orders = graft.sources.Tables.orders(spark, sf)
    val n = orders.count()
    assert(df.count() === 6)
    assert(df.filter(col("n_rows") =!= n).count() === 0)
    // synthetic orders has no nulls anywhere
    assert(df.filter(col("n_nonnull") =!= n).count() === 0)
    // numeric columns carry num bounds only; string/date columns str only
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("o_orderkey", "o_custkey", "o_totalprice")) {
      assert(rows(c).isNullAt(rows(c).fieldIndex("min_str")), c)
      assert(!rows(c).isNullAt(rows(c).fieldIndex("min_num")), c)
    }
    for (c <- Seq("o_orderstatus", "o_orderpriority", "o_orderdate")) {
      assert(rows(c).isNullAt(rows(c).fieldIndex("min_num")), c)
      assert(!rows(c).isNullAt(rows(c).fieldIndex("min_str")), c)
    }
    // spot parity against direct recomputes
    assert(rows("o_custkey").getAs[Long]("n_distinct") ===
      orders.select("o_custkey").distinct().count())
    assert(rows("o_totalprice").getAs[Double]("max_num") ===
      math.floor(orders.agg(max("o_totalprice")).head.getDouble(0) * 100 + 0.5) / 100)
    assert(rows("o_orderstatus").getAs[String]("min_str") ===
      orders.agg(min("o_orderstatus")).head.getString(0))
    df.unpersist()
  }
}
