package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-validation gates — the checks a production pipeline runs BEFORE
  * training data reaches a model: declarative constraint suites
  * (completeness / uniqueness / range / domain, the Deequ check
  * vocabulary, Schelter et al. VLDB'18), referential-integrity audits
  * over the star schema, two-sample Kolmogorov–Smirnov drift between
  * corpus sources (the nonparametric complement of [[Features.psiDrift]]'s
  * binned PSI), and a trailing-window z-score anomaly screen on event
  * volumes. The reference validates implicitly (`make_classification`
  * guarantees its own schema, `/root/reference/src/data_generation.py:5`);
  * at 100 TB ingest nothing guarantees anything — these gates are the
  * explicit contract.
  *
  * Scale design: every check is either ONE fused aggregate over the fact
  * table reduced to a constant-size report (constraints), a distinct-key
  * pre-aggregation so the anti-join shuffles keys not rows (referential
  * integrity), or a window over a per-group value grid whose size is
  * bounded by distinct values, never row count (KS, anomaly). No check
  * funnels rows through a single task.
  */
object Validate {

  /** Shared cross-engine half-up rounding (BASELINE.md round-1 idiom). */
  private def halfUp(c: Column, k: Double): Column = floor(c * k + 0.5) / k

  // ---- constraint suite ----------------------------------------------

  /** Constraint names, shared with the DuckDB twin so scorer and oracle
    * can never drift on labels. Order is the output order. */
  val constraintNames: Seq[String] = Seq(
    "completeness:l_orderkey",
    "completeness:l_shipdate",
    "uniqueness:l_orderkey,l_linenumber",
    "uniqueness:l_orderkey",
    "range:l_quantity>0",
    "range:l_extendedprice>0",
    "range:l_discount[0,0.1]",
    "range:l_tax[0,0.08]",
    "domain:l_returnflag{A,N,R}",
    "domain:l_linestatus{F,O}",
    "range:l_shipdate[1995,2002]")

  /** Deequ-style declarative constraint suite over `lineitem`: each row is
    * one check with its observed satisfaction ratio in [0,1], the declared
    * threshold, and the pass verdict. Two passes, neither with an Expand:
    * the non-distinct checks fuse into one keyless conditional-sum scan,
    * and both uniqueness counts come off a single grouped dedup (see
    * inline comment). The report is 11 rows regardless of input size.
    *
    * Determinism: observed = ratio of exact longs (one IEEE division,
    * identical on both engines), then the floor-based half-up rounding at
    * 6dp; `passed` compares the already-rounded value. */
  def constraintSuite(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def sat(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))
    // non-distinct checks: one keyless fused aggregate, pure
    // whole-stage-codegen scan, shuffle output = 1 row
    val plain = li.agg(
      count(lit(1)).as("n"),
      count(col("l_orderkey")).as("s_c_ok"),
      count(col("l_shipdate")).as("s_c_sd"),
      sat(col("l_quantity") > 0).as("s_r_qty"),
      sat(col("l_extendedprice") > 0).as("s_r_px"),
      sat(col("l_discount").between(0.0, 0.1)).as("s_r_disc"),
      sat(col("l_tax").between(0.0, 0.08)).as("s_r_tax"),
      sat(col("l_returnflag").isin("A", "N", "R")).as("s_d_rf"),
      sat(col("l_linestatus").isin("F", "O")).as("s_d_ls"),
      sat(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2003-01-01"))).as("s_r_sd"))
    // both uniqueness checks from ONE grouped two-level aggregation,
    // no Expand anywhere (the previous two-distinct single aggregate
    // tripled every fact row through Expand): a single distinct inside
    // groupBy(l_orderkey) plans as partial-dedup-by-(ok,ln) →
    // count-by-ok, so distinct pairs = sum of per-order line counts and
    // distinct orderkeys = group count, off the same shuffled dedup.
    // The second scan reads ONLY the two key columns (column pruning);
    // at 100 TB the narrow re-scan is cheaper than tripling the wide
    // rows through the Expand exchange.
    val uniq = li
      .groupBy(col("l_orderkey"))
      .agg(count_distinct(col("l_linenumber")).as("d_ln"))
      .agg(sum(col("d_ln")).as("s_u_pk"), count(lit(1)).as("s_u_ok"))
    val agg = plain.crossJoin(broadcast(uniq))
    val satCols = Seq("s_c_ok", "s_c_sd", "s_u_pk", "s_u_ok", "s_r_qty",
      "s_r_px", "s_r_disc", "s_r_tax", "s_d_rf", "s_d_ls", "s_r_sd")
    auditReport(agg, constraintNames.zip(satCols))
  }

  /** Shared report shaping for every check suite: one wide row of
    * satisfaction counts (`n` plus one column per check) exploded into
    * (check_name, observed, threshold, passed) rows. `passed` compares
    * EXACT counts (sat == n), never the rounded ratio — at 2M+ rows a
    * 6dp-rounded ratio absorbs a real violation; the ratio is for
    * humans, the verdict is for gates. Zero input rows: observed is
    * null (no 0/0) and passed is false — an empty load must read red,
    * not crash or pass. */
  private def auditReport(wide: DataFrame,
                          pairs: Seq[(String, String)]): DataFrame = {
    val entries = pairs.map { case (name, c) =>
      struct(lit(name).as("check_name"),
        when(col("n") > 0,
          halfUp(col(c).cast("double") / col("n").cast("double"), 1e6))
          .as("observed"),
        (col("n") > 0 && col(c) === col("n")).as("passed"))
    }
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.check_name").as("check_name"), col("e.observed"),
        lit(1.0).as("threshold"), col("e.passed").as("passed"))
      .orderBy(col("check_name"))
  }

  /** Shared DuckDB-twin generator for check suites: same exact-count
    * verdict and zero-row semantics as [[auditReport]]. `defs` pairs
    * each check name with its aggregate satisfaction expression. */
  private def auditReportSql(defs: Seq[(String, String)],
                             table: String): String = {
    val rows = defs.map { case (name, satExpr) =>
      s"SELECT '$name' AS check_name, CAST($satExpr AS BIGINT) AS sat, " +
        s"count(*) AS n FROM $table"
    }
    "WITH obs AS (" + rows.mkString(" UNION ALL ") + ") " +
      "SELECT check_name, CASE WHEN n > 0 THEN " +
      "floor(CAST(sat AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 " +
      "END AS observed, 1.0 AS threshold, " +
      "n > 0 AND sat = n AS passed FROM obs ORDER BY check_name"
  }

  /** DuckDB twin of [[constraintSuite]], generated from the same name
    * list and predicates so the two can never drift. */
  def constraintSuiteSql: String = {
    val preds = Seq(
      "count(l_orderkey)",
      "count(l_shipdate)",
      // mirrors the engine's grouped-dedup form (count_distinct of
      // l_linenumber per l_orderkey, summed) so both sides share NULL
      // semantics: a NULL linenumber is invisible to both, where the
      // previous concat_ws('#',...) twin counted it (round-6 ADVICE)
      "(SELECT sum(d) FROM (SELECT count(DISTINCT l_linenumber) AS d " +
        "FROM lineitem GROUP BY l_orderkey))",
      "count(DISTINCT l_orderkey)",
      "sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END)",
      "sum(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END)",
      "sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END)",
      "sum(CASE WHEN l_tax BETWEEN 0.0 AND 0.08 THEN 1 ELSE 0 END)",
      "sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END)",
      "sum(CASE WHEN l_linestatus IN ('F','O') THEN 1 ELSE 0 END)",
      "sum(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01' AND " +
        "l_shipdate < TIMESTAMP '2003-01-01' THEN 1 ELSE 0 END)")
    auditReportSql(constraintNames.zip(preds), "lineitem")
  }

  // ---- referential integrity -----------------------------------------

  /** Generic orphan-foreign-key audit. `facts` are (relation label, fact
    * frame, FK column); `dims` are (relation label, dim frame, PK column)
    * — the SAME label ties a fact side to its dim side, and one dim table
    * may back several labels. Returns one row per relation:
    * (relation, fact_rows, orphans, orphan_rate).
    *
    * Scale shape: each fact is scanned ONCE (a multi-FK fact contributes
    * all its (relation, key) pairs via one generator), then reduced to
    * DISTINCT keys with counts — map-side partial aggregation does the
    * heavy lifting, so the join that finds dangling keys shuffles
    * |distinct keys| rows, not |fact| rows. Dangling keys are found with
    * one LEFT OUTER join against the (deduplicated) dim keys and a
    * conditional sum, NOT an anti join: an anti join would need a second
    * pass over the key frame for the denominators (and Catalyst's
    * `PushDownLeftSemiAntiJoin` would rewrite it onto raw fact rows,
    * exactly the shuffle this shape avoids). A null FK never matches and
    * is therefore counted as dangling. */
  def refIntegrityOf(facts: Seq[(DataFrame, Seq[(String, String)])],
                     dims: Seq[(String, DataFrame, String)]): DataFrame = {
    // relation labels ride the wide exchanges as SMALL INTS, decoded back
    // to strings only on the final |relations|-row report — the three
    // shuffles (fact key dedup, dim key dedup, orphan join) carry
    // (int, long) keys instead of ~30-char strings, which at 100 TB is
    // the difference between shuffling keys and shuffling label text
    val labels: Seq[String] =
      facts.flatMap(_._2.map(_._1)).distinct
    val idOf: Map[String, Int] = labels.zipWithIndex.toMap
    val factKeys = facts.map { case (df, fks) =>
      val entries = fks.map { case (rel, c) =>
        struct(lit(idOf(rel)).as("rel_id"), col(c).cast("long").as("k"))
      }
      df.select(explode(array(entries: _*)).as("e"))
        .select(col("e.rel_id").as("rel_id"), col("e.k").as("k"))
    }.reduce(_ union _)
    val dimKeys = dims.map { case (rel, df, pk) =>
      df.select(lit(idOf(rel)).as("rel_id"), col(pk).cast("long").as("k"))
    }.reduce(_ union _)
    val perKey = factKeys.groupBy(col("rel_id"), col("k"))
      .agg(count(lit(1)).as("cnt"))
    val decode = labels.zipWithIndex
      .map { case (l, i) => when(col("rel_id") === i, l) }
      .reduceRight(_ otherwise _)
    perKey
      .join(dimKeys.distinct().withColumn("hit", lit(1)),
        Seq("rel_id", "k"), "left")
      .groupBy(col("rel_id"))
      .agg(sum(col("cnt")).as("fact_rows"),
        sum(when(col("hit").isNull, col("cnt")).otherwise(0L)).as("orphans"))
      .select(decode.as("relation"), col("fact_rows"), col("orphans"),
        halfUp(col("orphans").cast("double") /
          col("fact_rows").cast("double"), 1e6).as("orphan_rate"))
      .orderBy(col("relation"))
  }

  /** The star-schema audit as a declared query: every FK edge in the
    * TPC-H-ish schema, lineitem's three edges from one scan. */
  def refIntegrity(spark: SparkSession, dir: String): DataFrame = {
    refIntegrityOf(
      facts = Seq(
        (Tables.lineitem(spark, dir), Seq(
          ("lineitem.l_orderkey->orders", "l_orderkey"),
          ("lineitem.l_partkey->part", "l_partkey"),
          ("lineitem.l_suppkey->supplier", "l_suppkey"))),
        (Tables.orders(spark, dir),
          Seq(("orders.o_custkey->customer", "o_custkey"))),
        (Tables.customer(spark, dir),
          Seq(("customer.c_nationkey->nation", "c_nationkey"))),
        (Tables.supplier(spark, dir),
          Seq(("supplier.s_nationkey->nation", "s_nationkey")))),
      dims = Seq(
        ("lineitem.l_orderkey->orders", Tables.orders(spark, dir), "o_orderkey"),
        ("lineitem.l_partkey->part", Tables.part(spark, dir), "p_partkey"),
        ("lineitem.l_suppkey->supplier", Tables.supplier(spark, dir), "s_suppkey"),
        ("orders.o_custkey->customer", Tables.customer(spark, dir), "c_custkey"),
        ("customer.c_nationkey->nation", Tables.nation(spark, dir), "n_nationkey"),
        ("supplier.s_nationkey->nation", Tables.nation(spark, dir), "n_nationkey")))
  }

  // ---- two-sample KS drift -------------------------------------------

  /** Two-sample Kolmogorov–Smirnov statistic — for EACH source, its
    * value distribution against the pooled rest of the corpus:
    * KS(s) = max over values v of |F_s(v) − F_rest(v)| where F is the
    * empirical CDF. The nonparametric, binning-free complement of the PSI
    * screen: PSI needs bin edges, KS ranks every source by raw
    * distributional distance.
    *
    * Shape: one (source, value) group-count, a dense source×value grid so
    * every ECDF is evaluated at every observed value, a per-source
    * running sum for F_s, and — instead of a global-order window (single
    * task, banned shape) — F_all at each value is recovered as a
    * partition-by-value sum of the per-source cumulatives; F_rest is then
    * (all − s) / (T − t_s). Window partitions are per-source (V rows) and
    * per-value (S rows); nothing is single-task. Cost is S×V grid rows,
    * independent of corpus row count.
    *
    * Determinism: cumulatives and totals are exact longs; the two ECDF
    * divisions, subtraction, abs, and max are identical IEEE ops on both
    * engines; final half-up round at 6dp. Degenerate single-source input
    * (T − t_s = 0) yields null, not 0/0 (house rule).
    *
    * CARDINALITY GUARD (round-9 verdict #5): the S×V grid is bounded for
    * discrete columns like the declared doc-length query, but a
    * continuous high-cardinality value column would make V ≈ n and the
    * grid quadratic-ish. When the distinct-value count exceeds
    * `maxGridValues`, values are pre-binned into that many equi-width
    * buckets over the observed [min, max] (the [[Features.psiDrift]]
    * binning arithmetic, same degenerate-constant and last-bin-clamp
    * rules), and the KS sup runs over bin boundaries — a conservative
    * (never over-reporting) discretized KS whose grid is ≤ S×1024 rows
    * regardless of corpus cardinality. Below the bound the raw-value
    * path is untouched, so the declared `q_valid_ks_drift` checksum is
    * bit-identical. */
  val ksMaxGridValues = 1024

  def ksBySource(df: DataFrame, sourceCol: String, valueCol: String,
                 maxGridValues: Int = ksMaxGridValues): DataFrame = {
    val nVals = df.select(col(valueCol)).distinct().count()
    val keyed =
      if (nVals <= maxGridValues)
        df.select(col(sourceCol).as("source"), col(valueCol).as("v"))
      else {
        val mm = df.agg(min(col(valueCol)).cast("double").as("mn"),
          max(col(valueCol)).cast("double").as("mx"))
        df.crossJoin(broadcast(mm)).select(col(sourceCol).as("source"),
          when(col("mx") > col("mn"),
            least(floor((col(valueCol).cast("double") - col("mn")) *
              maxGridValues / (col("mx") - col("mn"))).cast("long"),
              lit(maxGridValues - 1L))).otherwise(lit(0L)).as("v"))
      }
    val counts = keyed.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c"))
    val grid = counts.select("source").distinct()
      .crossJoin(counts.select("v").distinct())
    val full = grid.join(counts, Seq("source", "v"), "left")
      .select(col("source"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val cum = full
      .withColumn("cum_s", sum(col("c"))
        .over(Window.partitionBy("source").orderBy("v")))
      .withColumn("cum_all", sum(col("cum_s"))
        .over(Window.partitionBy("v")))
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("t_s"))
    val grand = counts.agg(sum(col("c")).as("t_all"))
    cum.join(totals, Seq("source")).crossJoin(broadcast(grand))
      .groupBy(col("source"), col("t_s"), col("t_all"))
      .agg(max(when(col("t_all") > col("t_s"),
        abs(col("cum_s").cast("double") / col("t_s").cast("double") -
          (col("cum_all") - col("cum_s")).cast("double") /
            (col("t_all") - col("t_s")).cast("double")))).as("ks_raw"))
      .select(col("source"), col("t_s").as("n_source"),
        (col("t_all") - col("t_s")).as("n_rest"),
        halfUp(col("ks_raw"), 1e6).as("ks_stat"))
      .orderBy(col("source"))
  }

  /** The declared drift query: each document source's `n_chars` length
    * distribution vs the pooled rest. */
  def ksDrift(spark: SparkSession, dir: String): DataFrame =
    ksBySource(Tables.documents(spark, dir), "source", "n_chars")

  // ---- trailing-window anomaly screen --------------------------------

  /** Anomaly window length, shared with the DuckDB twin. */
  val anomalyWindow: Int = 7

  /** Scalar twin of the [[anomalyScores]] moment arithmetic, shared with
    * the streaming monitor ([[graft.streaming.EventStream.anomalyStateful]])
    * so both paths emit bit-identical (mu, z): exact Long sums cast once
    * to double, then the same fixed IEEE formula and half-up rounding as
    * the Column expressions. Returns (None, None) without a full
    * trailing window; z is None for a constant window (vr = 0). */
  def zScoreOf(n: Long, hist: Seq[Long]): (Option[Double], Option[Double]) =
    if (hist.length != anomalyWindow) (None, None)
    else {
      val w = anomalyWindow.toDouble
      val s = hist.sum.toDouble
      val sq = hist.map(x => x * x).sum.toDouble
      val mu0 = s / w
      val vr = (sq - s * s / w) / (w - 1.0)
      (Some(math.floor(mu0 * 1e6 + 0.5) / 1e6),
        if (vr > 0)
          Some(math.floor((n.toDouble - mu0) / math.sqrt(vr) * 1e6 + 0.5) / 1e6)
        else None)
    }

  /** z-score each (group, day, n) row against its own trailing
    * [[anomalyWindow]]-day window (current day excluded): the day-over-day
    * volume monitor that catches a collapsed ingest source or a runaway
    * duplicate burst. Rows without a full trailing window, or with a
    * constant window (variance 0), score null — never 0/0 (house rule).
    *
    * Determinism: the trailing mean and variance derive from exact
    * integer window sums (Σn, Σn²) via one fixed IEEE formula — counts
    * are longs, the sums are exact, so both engines compute bit-identical
    * moments regardless of partition order; z is then half-up-rounded at
    * 6dp. Windows partition by group — never a global order. */
  def anomalyScores(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("grp").orderBy("day")
      .rowsBetween(-anomalyWindow, -1)
    val dd = lit(anomalyWindow.toDouble)
    val scored = daily
      .withColumn("w_n", count(col("n")).over(w))
      .withColumn("w_sum", sum(col("n")).over(w).cast("double"))
      .withColumn("w_sumsq",
        sum(col("n") * col("n")).over(w).cast("double"))
      .withColumn("mu", col("w_sum") / dd)
      .withColumn("vr",
        (col("w_sumsq") - col("w_sum") * col("w_sum") / dd) / (dd - 1.0))
    scored.select(col("grp"), col("day"), col("n"),
      when(col("w_n") === anomalyWindow, halfUp(col("mu"), 1e6)).as("mu"),
      when(col("w_n") === anomalyWindow && col("vr") > 0,
        halfUp((col("n").cast("double") - col("mu")) / sqrt(col("vr")), 1e6))
        .as("z"))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > 3.0, lit(false)))
      .orderBy(col("grp"), col("day"))
  }

  /** Calendar-dense per-group day grid: every day from a group's first
    * observed day to the CORPUS-wide last observed day appears, with
    * n = 0 where the group produced nothing — so a fully collapsed
    * source scores its silent days as extreme negative z instead of
    * silently vanishing from the monitor (round-5 ADVICE). Grid size is
    * O(groups × days) — bounded by the calendar and the group
    * dimension, never row count — and the grid build is two tiny
    * aggregates plus a broadcast, so the scale shape of the section
    * holds. The grid ends at the GLOBAL max day: a group's own max
    * would hide exactly the trailing collapse this exists to catch
    * (detection needs at least one source still alive, which is what
    * defines the corpus horizon). */
  private[graft] def densifyDays(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(max(to_date(col("day"))).as("mx"))
    val grid = daily.groupBy(col("grp"))
      .agg(min(to_date(col("day"))).as("mn"))
      .crossJoin(broadcast(bounds))
      .select(col("grp"), explode(sequence(col("mn"), col("mx"))).as("d"))
      .select(col("grp"), date_format(col("d"), "yyyy-MM-dd").as("day"))
    grid.join(daily, Seq("grp", "day"), "left")
      .select(col("grp"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** The declared query: per-event-type daily volumes from the events
    * stream, densified per group ([[densifyDays]]) and scored by
    * [[anomalyScores]] — zero-volume days are real scored rows, so both
    * mid-stream gaps and a trailing full collapse flag. Day labels are
    * formatted in the session time zone (UTC, `Tables.configure`),
    * matching the oracle's naive timestamps. */
  def dailyAnomaly(spark: SparkSession, dir: String): DataFrame =
    anomalyScores(densifyDays(Tables.events(spark, dir)
      .select(col("event_type").as("grp"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .groupBy(col("grp"), col("day")).agg(count(lit(1)).as("n"))))

  // ---- freshness ------------------------------------------------------

  /** Per-source freshness monitor: each event type's row count, last
    * event time, and staleness (milliseconds behind the freshest source)
    * — the check that catches a silently dead ingest feed before the
    * next model refresh trains on a stale slice. One grouped aggregate;
    * the global high-water mark derives from the tiny per-group frame,
    * broadcast back. Staleness is an exact long difference of epoch
    * milliseconds — no float anywhere. */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .groupBy(col("event_type").as("grp"))
      .agg(count(lit(1)).as("n"), max(col("ts")).as("mx"))
    val glob = per.agg(max(col("mx")).as("gmx"))
    per.crossJoin(broadcast(glob))
      .select(col("grp"), col("n"),
        date_format(col("mx"), "yyyy-MM-dd HH:mm:ss").as("last_seen"),
        (unix_millis(col("gmx")) - unix_millis(col("mx")))
          .as("staleness_ms"))
      .orderBy(col("grp"))
  }

  // ---- snapshot diff --------------------------------------------------

  /** Generic CDC-style snapshot diff: per key, classify the transition
    * from `oldDf` to `newDf` as added / removed / changed / unchanged
    * (changed = any compare column not null-safe-equal). Returns the
    * row-level (keys..., status) frame; aggregate for the summary.
    *
    * Scale shape: ONE full-outer sort-merge join on the key — the
    * standard lake-diff; co-locate with bucketing on the key when both
    * snapshots are published bucketed ([[graft.store.FeatureStore]]
    * layouts) and the exchange disappears entirely. Value comparison is
    * a codegen'd projection, no second pass. */
  def snapshotDiffRows(oldDf: DataFrame, newDf: DataFrame,
                       keys: Seq[String], vals: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ vals).map(col): _*)
      .toDF(keys.map("k_" + _) ++ vals.map("o_" + _): _*)
    val n = newDf.select((keys ++ vals).map(col): _*)
      .toDF(keys.map("n_" + _) ++ vals.map("n_" + _): _*)
    val joinCond = keys.map(k => col("k_" + k) <=> col("n_" + k))
      .reduce(_ && _)
    val oPresent = keys.map(k => col("k_" + k).isNotNull).reduce(_ || _)
    val nPresent = keys.map(k => col("n_" + k).isNotNull).reduce(_ || _)
    val sameVals = vals.map(v => col("o_" + v) <=> col("n_" + v))
      .foldLeft(lit(true))(_ && _)
    o.join(n, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col("k_" + k), col("n_" + k)).as(k)) :+
          when(!oPresent, "added")
            .when(!nPresent, "removed")
            .when(!sameVals, "changed")
            .otherwise("unchanged").as("status"): _*)
  }

  /** The declared diff query: yesterday's orders snapshot is simulated
    * deterministically from today's (every 97th key missing = added
    * today, every 89th price back-dated by 1.0 = changed, every 101st
    * key re-signed to -(k+1) = removed today), then [[snapshotDiffRows]]
    * reduces to the 4-row status summary. The modulus constants are
    * shared with the DuckDB twin via [[snapshotDiffMods]]. */
  val snapshotDiffMods: (Int, Int, Int) = (97, 89, 101)

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val (addM, chgM, remM) = snapshotDiffMods
    val orders = Tables.orders(spark, dir)
    val vOld = orders.where(pmod(col("o_orderkey"), lit(addM)) =!= 0)
      .select(col("o_orderkey").as("k"),
        when(pmod(col("o_orderkey"), lit(chgM)) === 0,
          col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("v"))
      // re-signed as -(k+1): plain -k would collide with a real key 0
      .union(orders.where(pmod(col("o_orderkey"), lit(remM)) === 0)
        .select((-(col("o_orderkey") + 1)).as("k"),
          col("o_totalprice").as("v")))
    val vNew = orders.select(col("o_orderkey").as("k"),
      col("o_totalprice").as("v"))
    snapshotDiffRows(vOld, vNew, Seq("k"), Seq("v"))
      .groupBy(col("status")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("status"))
  }

  /** CDC MERGE apply — the write half of the lake-diff contract
    * [[snapshotDiffRows]] reads: apply a change feed (inserts / updates /
    * deletes) to a published base snapshot and summarize the resulting
    * table. The feed derives deterministically from the corpus with the
    * same pmod families as [[snapshotDiff]] (deletes `k % remM == 0`,
    * updates `k % chgM == 0`, inserts re-keyed negative), so the DuckDB
    * twin replays it exactly; updated prices use exact integer-cent
    * arithmetic (`cents · 110 div 100`) — no float drift.
    *
    * Scale shape: the standard distributed MERGE — one LEFT ANTI join
    * drops deleted/updated keys from the base, the update and insert
    * branches are narrow unions; every join is an equi-join on the key,
    * so with both sides bucketed on the key ([[graft.store.FeatureStore]]
    * layouts) the whole apply is exchange-free. No row is ever rewritten
    * in place — the output IS the next snapshot version (the
    * write-audit-publish gate [[writeAuditPublish]] covers promotion). */
  def cdcMergeApply(spark: SparkSession, dir: String): DataFrame = {
    val (addM, chgM, remM) = snapshotDiffMods
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val deletes = orders.where(pmod(col("k"), lit(remM)) === 0)
      .select(col("k"))
    val updates = orders
      .where(pmod(col("k"), lit(chgM)) === 0 && pmod(col("k"), lit(remM)) =!= 0)
      .select(col("k"), col("prio"), expr("cents * 110L div 100L").as("cents"))
    val inserts = orders.where(pmod(col("k"), lit(addM)) === 0)
      .select((-(col("k") + 1)).as("k"), col("prio"), col("cents"))
    val touched = deletes.union(updates.select(col("k")))
    orders.join(touched, Seq("k"), "left_anti")
      .unionByName(updates)
      .unionByName(inserts)
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("total_cents"))
      .orderBy(col("prio"))
  }

  // ---- Benford screen -------------------------------------------------

  /** Benford first-digit expectations log10(1 + 1/d), shared with the
    * DuckDB twin as round-trippable double literals. */
  val benfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** Benford's-law first-digit screen over `l_extendedprice`: observed
    * vs expected first-significant-digit distribution with per-digit
    * chi-square contributions — the forensic screen that flags
    * fabricated or synthetically generated numeric columns (Nigrini's
    * auditing test). On this corpus it reads HOT, correctly: the test
    * data is synthetic and near-uniform in its leading digit, which is
    * precisely what the screen exists to catch.
    *
    * Digit extraction is integer-exact on both engines: cents =
    * floor(price·100 + 0.5) as a long, first digit = first character of
    * the long's decimal string — never a float log10. One scan, 9-row
    * output via a dense digit grid (a digit absent from the data still
    * reports its expectation). */
  def benfordScreen(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.lineitem(spark, dir)
      .where(col("l_extendedprice") > 0)
      .select(substring(floor(col("l_extendedprice") * 100 + 0.5)
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val full = spark.range(1, 10).select(col("id").cast("int").as("digit"))
      .join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val expected = benfordP.tail.foldLeft(
      when(col("digit") === benfordP.head._1, lit(benfordP.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
    }
    // total via a window over the NINE-row digit grid (bounded by the
    // grid, not the data — the single-task concern doesn't apply), so
    // the fact table is scanned exactly once (plan-spec pinned)
    full.withColumn("t",
        sum(col("n")).over(Window.partitionBy(lit(1))))
      .withColumn("p", expected)
      .select(col("digit"), col("n"),
        halfUp(col("n").cast("double") / col("t").cast("double"), 1e6)
          .as("observed_p"),
        halfUp(col("p"), 1e6).as("expected_p"),
        halfUp(
          (col("n").cast("double") - col("t").cast("double") * col("p")) *
            (col("n").cast("double") - col("t").cast("double") * col("p")) /
            (col("t").cast("double") * col("p")), 1e6).as("chi2_term"))
      .orderBy(col("digit"))
  }

  // ---- write-audit-publish -------------------------------------------

  /** Generic per-row constraint audit: each check is a boolean Column
    * predicate; the report row carries its satisfaction ratio against a
    * 1.0 threshold, same shape as [[constraintSuite]] (which stays
    * specialized for its distinct-count checks). ONE conditional-sum
    * aggregate regardless of check count. */
  def auditChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      checks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"s_$i")
      }
    auditReport(df.agg(aggs.head, aggs.tail: _*),
      checks.zipWithIndex.map { case ((name, _), i) => (name, s"s_$i") })
  }

  /** Documents expectation suite: predicate STRINGS shared verbatim by
    * both engines — Spark parses each with `expr()`, the DuckDB twin
    * embeds the same text in its CASE sums — so scorer and oracle
    * literally evaluate the same predicate source. Includes the
    * cross-field consistency expectation (`n_chars` must equal the
    * recomputed text length) a corpus load is most likely to break. */
  val docCheckDefs: Seq[(String, String)] = Seq(
    ("completeness:text", "text IS NOT NULL"),
    ("completeness:lang", "lang IS NOT NULL"),
    ("domain:lang{de,en,es,fr,zh}", "lang IN ('de','en','es','fr','zh')"),
    ("range:n_chars>0", "n_chars > 0"),
    ("consistency:n_chars=length(text)", "n_chars = length(text)"))

  /** The declared expectation-suite query over documents: ONE
    * conditional-sum aggregate via [[auditChecks]]. */
  def docChecks(spark: SparkSession, dir: String): DataFrame =
    auditChecks(Tables.documents(spark, dir),
      docCheckDefs.map { case (n, p) => (n, expr(p)) })

  /** DuckDB twin of [[docChecks]], generated from [[docCheckDefs]]. */
  def docChecksSql: String =
    auditReportSql(docCheckDefs.map { case (name, pred) =>
      (name, s"sum(CASE WHEN $pred THEN 1 ELSE 0 END)")
    }, "documents")

  /** Write–audit–publish: stage the frame as parquet next to the target,
    * audit the STAGED bytes (so writer bugs are caught, not just source
    * defects), and promote to `path` only when every check passes — the
    * Iceberg-WAP-style gate that keeps a broken load out of the
    * published table. Returns (published?, report). An empty staged load
    * reads RED ([[auditReport]]'s zero-row rule), not as a vacuous pass.
    *
    * Promotion never deletes the live table before the new one is in
    * place: the current publish is first RETIRED by rename, the staging
    * dir renamed in, and only then the retired copy deleted — both
    * renames are checked, and a failed promote renames the retired copy
    * straight back, so the published path either still holds the old
    * data or already holds the new, never neither. Each invocation
    * stages under a unique suffix, so concurrent gates on the same
    * target can't audit each other's half-written bytes; a red load's
    * staging dir is retained (under its unique name) for inspection.
    *
    * Scale shape: the stage write is the load itself; the audit is one
    * [[auditChecks]] aggregate over the staged files; promote is O(1)
    * metadata. */
  def writeAuditPublish(spark: SparkSession, df: DataFrame, path: String,
                        checks: Seq[(String, Column)]): (Boolean, DataFrame) = {
    import org.apache.hadoop.fs.Path
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val staging = s"$path.staging-$runId"
    df.write.mode("overwrite").parquet(staging)
    val staged = spark.read.schema(df.schema).parquet(staging)
    val lazyReport = auditChecks(staged, checks)
    // materialize the constant-size report BEFORE promoting: the rename
    // below invalidates the staged scan the lazy plan reads from
    val rows = lazyReport.collect()
    val ok = rows.forall(_.getBoolean(3))
    if (ok) {
      val dst = new Path(path)
      val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
      val retired = new Path(s"$path.retired-$runId")
      val hadPrev = fs.exists(dst)
      if (hadPrev && !fs.rename(dst, retired))
        throw new IllegalStateException(
          s"audit-publish: could not retire the current publish at $path")
      if (!fs.rename(new Path(staging), dst)) {
        // the restore rename is itself checked: if promote AND restore
        // both fail the published path holds neither old nor new data —
        // raise a distinct error naming the retired copy so an operator
        // can recover it manually (round-5 ADVICE)
        if (hadPrev && !fs.rename(retired, dst))
          throw new IllegalStateException(
            s"audit-publish: promote AND restore both failed for $path — " +
              s"published path is empty; previous data retained at $retired")
        throw new IllegalStateException(
          s"audit-publish: promote failed for $path; previous publish restored")
      }
      if (hadPrev) fs.delete(retired, true)
    }
    (ok, spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), lazyReport.schema))
  }

  /** Derived table the declared WAP query stages: a per-customer order
    * profile. Defined ONCE as an ANSI SQL template shared with the
    * DuckDB twin (which instantiates it over its `orders` view); the
    * Spark side parses the same text over a DIR-SCOPED temp view —
    * generic view names are shared session state and a silent cross-dir
    * collision (the repo's round-2 hygiene rule). Gate and oracle can
    * never drift on the staged data. All columns are cross-engine exact
    * (longs and a max of doubles — no order-dependent float sums). */
  def wapProfileSqlFor(table: String): String =
    "SELECT o_custkey, count(*) AS n_orders, max(o_totalprice) AS max_price " +
      s"FROM $table GROUP BY o_custkey"

  /** WAP audit predicates, shared verbatim with the DuckDB twin —
    * the [[docCheckDefs]] pattern. */
  val wapCheckDefs: Seq[(String, String)] = Seq(
    ("completeness:o_custkey", "o_custkey IS NOT NULL"),
    ("range:n_orders>0", "n_orders > 0"),
    ("range:max_price>0", "max_price > 0"))

  /** The write–audit–publish gate as a declared query: stage the
    * [[wapProfileSqlFor]] profile via [[writeAuditPublish]] into a fresh
    * temp target, and return the audit report with the promote verdict
    * (`published` = every check passed) — so the driver's oracle row
    * exercises the full stage→audit→promote path, not just the report
    * arithmetic. The staged BYTES are what gets audited (writer bugs
    * surface, per the WAP contract); the report the query returns is the
    * constant-size frame the gate collected from those bytes. */
  def wapGate(spark: SparkSession, dir: String): DataFrame = {
    val vn = "graft_wap_orders_v_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    Tables.orders(spark, dir).createOrReplaceTempView(vn)
    val profile = spark.sql(wapProfileSqlFor(vn))
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-wap")
    val target = tmpRoot.resolve("orders_profile").toString
    val (ok, report) = writeAuditPublish(spark, profile, target,
      wapCheckDefs.map { case (n, p) => (n, expr(p)) })
    val out = report.withColumn("published", lit(ok))
    // the report is already materialized rows (writeAuditPublish
    // collects before promoting), so the staged/published bytes of this
    // throwaway target can be reclaimed immediately — repeated gate runs
    // must not accumulate temp publishes
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(tmpRoot.toString), true)
    out
  }

  /** DuckDB twin of [[wapGate]]: replays the same profile SQL and the
    * same predicate strings through the [[auditReportSql]] arithmetic;
    * `published` is the conjunction of the per-check verdicts, exactly
    * the promote rule [[writeAuditPublish]] applies. */
  def wapSql: String = {
    val rows = wapCheckDefs.map { case (name, pred) =>
      s"SELECT '$name' AS check_name, " +
        s"CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS sat, " +
        "count(*) AS n FROM t"
    }
    s"WITH t AS (${wapProfileSqlFor("orders")}), obs AS (${rows.mkString(" UNION ALL ")}), " +
      "rep AS (SELECT check_name, CASE WHEN n > 0 THEN " +
      "floor(CAST(sat AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 " +
      "END AS observed, 1.0 AS threshold, n > 0 AND sat = n AS passed " +
      "FROM obs) " +
      "SELECT check_name, observed, threshold, passed, " +
      "(SELECT bool_and(passed) FROM rep) AS published " +
      "FROM rep ORDER BY check_name"
  }

  // ---- cross-table consistency ---------------------------------------

  /** Denormalization-consistency audit: recompute each order's total
    * from its line items (Σ extendedprice·(1+tax)·(1−discount)) and
    * report how far the stored `o_totalprice` drifts — plus the
    * childless orders the join can't explain at all. The classic
    * cross-table invariant check a warehouse runs after every load; on
    * this corpus it honestly reports the invariant BROKEN (the synthetic
    * generator never enforced it), which is exactly the report a real
    * audit would file.
    *
    * Determinism: the recomputed total is summed in EXACT decimal
    * arithmetic — all three factors have ≤2 decimals, so each line value
    * is an exact DECIMAL(30,6) and the per-order sum is order-independent
    * (the `q_feat_scale` lesson: never order-dependent double sums under
    * a cross-engine compare). The relative deviation is then one
    * correctly-rounded decimal→double conversion and one IEEE division,
    * identical on both engines; threshold compares and the 6dp-rounded
    * max follow deterministically.
    *
    * Scale shape: one map-side-combinable decimal aggregate over the
    * fact table, one key-partitioned shuffle of orders onto the same
    * partitioning for the join, one constant-size report row.
    *
    * A non-positive `o_totalprice` can't anchor a relative deviation
    * (0 would 0-divide, negative would sign-flip the compare) — such
    * orders classify as beyond-10pct, so the three buckets plus
    * childless always partition `n_orders` exactly. */
  def consistencyAudit(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(3,2)")
    val s = Tables.lineitem(spark, dir).groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (one + col("l_tax").cast("decimal(4,2)")) *
        (one - col("l_discount").cast("decimal(4,2)"))).as("recomputed"))
    val rel = when(col("o_totalprice") > 0,
      abs(col("o_totalprice").cast("decimal(18,2)") -
        col("recomputed")).cast("double") / col("o_totalprice"))
    Tables.orders(spark, dir)
      .join(s, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_totalprice"), col("recomputed"), rel.as("rel"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("recomputed").isNull, 1L).otherwise(0L))
          .as("n_childless"),
        sum(when(col("rel") < 0.01, 1L).otherwise(0L)).as("n_within_1pct"),
        sum(when(col("rel") < 0.10, 1L).otherwise(0L)).as("n_within_10pct"),
        sum(when(col("recomputed").isNotNull &&
          (col("rel").isNull || col("rel") >= 0.10), 1L).otherwise(0L))
          .as("n_beyond_10pct"),
        halfUp(max(col("rel")), 1e6).as("max_rel_dev"))
  }

  /** DuckDB twin of [[benfordScreen]], generated from the same
    * [[benfordP]] constants (Double.toString round-trips exactly, so
    * both engines hold bit-identical expectations). */
  def benfordSql: String = {
    val caseP = benfordP.map { case (d, p) => s"WHEN $d THEN $p" }
      .mkString("CASE digit ", " ", " END")
    s"""WITH d0 AS (SELECT CAST(substr(CAST(CAST(
       |   floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
       |   1, 1) AS INT) AS digit
       |  FROM lineitem WHERE l_extendedprice > 0),
       |c AS (SELECT digit, count(*) AS n FROM d0 GROUP BY 1),
       |grid AS (SELECT unnest(generate_series(1, 9)) AS digit),
       |f AS (SELECT grid.digit AS digit,
       |   CAST(coalesce(c.n, 0) AS BIGINT) AS n
       |  FROM grid LEFT JOIN c ON c.digit = grid.digit),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM f),
       |e AS (SELECT digit, n, $caseP AS p FROM f)
       |SELECT e.digit, e.n,
       | floor(CAST(e.n AS DOUBLE) / CAST(t.t AS DOUBLE) * 1e6 + 0.5) / 1e6
       |  AS observed_p,
       | floor(p * 1e6 + 0.5) / 1e6 AS expected_p,
       | floor((CAST(e.n AS DOUBLE) - CAST(t.t AS DOUBLE) * p)
       |   * (CAST(e.n AS DOUBLE) - CAST(t.t AS DOUBLE) * p)
       |   / (CAST(t.t AS DOUBLE) * p) * 1e6 + 0.5) / 1e6 AS chi2_term
       |FROM e CROSS JOIN t ORDER BY e.digit""".stripMargin
  }
}
