package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-series forecasting backtest over the fact history — the
  * monitoring/planning family a production feature platform runs beside
  * its training pipelines (is next month's volume in line with the
  * model's training distribution?). The reference (`src/main.py:7-48`)
  * has no temporal surface; this pack is part of the extended mandate,
  * like the event-time and validation families.
  *
  * Methods are the two classical exact baselines every forecasting text
  * starts from (Hyndman & Athanasopoulos, "Forecasting: Principles and
  * Practice", §5.2 — public): SEASONAL NAIVE (ŷ_t = y_{t−12}) and DRIFT
  * (ŷ_{T+h} = y_T + h·(y_T−y_1)/(T−1)). Both are deliberately
  * parameter-free and deterministic so the backtest is oracle-checkable:
  * revenue is carried in integer CENTS, the drift slope uses exact
  * integer division normalized to truncate toward zero on both engines,
  * and the only doubles are the final fixed-rounding MAE displays.
  */
object TimeSeries {

  /** Per-nation 6-month holdout backtest of seasonal-naive vs drift on
    * the monthly order-revenue series.
    *
    * Scale shape: ONE pass over `orders` (customer dim under a
    * size-guarded [[Hints.dimHint]] — it grows linearly with SF) builds
    * the monthly series — the only corpus-sized work; everything after
    * operates on O(nations × months) rows: a broadcast self-join for the
    * month-keyed seasonal reference, one window for index/length, a
    * 2-row-per-nation conditional aggregate for
    * the drift anchors (broadcast back), and a ~6-row-per-nation error
    * aggregate. At 100 TB the series frame is still tiny — the plan's
    * cost is the fact scan, exactly as it should be. */
  def revenueForecastBacktest(spark: SparkSession, dir: String,
                              horizon: Int = 6): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    // localCheckpoint: the series frame is O(nations × months) tiny, and
    // the seasonal self-join below would otherwise re-run the corpus-sized
    // fact scan a second time.
    val monthly = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .join(Hints.dimHint(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mk"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .localCheckpoint()
    // Seasonal term keyed on the CALENDAR month index (mk − 12), not 12
    // ROWS back: a nation with a gap month gets a NULL seasonal reference
    // for the month that has no y_{t−12}, instead of silently comparing
    // against the wrong month (round-7 ADVICE). Both engines share the
    // NULL-skipping SAE semantics on such rows.
    val prev = monthly.select(col("nk").as("p_nk"), col("mk").as("p_mk"),
      col("cents").as("snv"))
    val byMk = Window.partitionBy(col("nk")).orderBy(col("mk"))
    val ser = monthly
      .join(broadcast(prev),
        col("nk") === col("p_nk") && col("p_mk") === col("mk") - 12, "left")
      .drop("p_nk", "p_mk")
      .withColumn("idx", row_number().over(byMk).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("nk")))
        .cast("long"))
      .where(col("m") >= 12 + horizon)
    // drift anchors: first train value y1 and last train value yT
    val anchors = ser
      .where(col("idx") === 1 || col("idx") === col("m") - horizon)
      .groupBy(col("nk"))
      .agg(max(when(col("idx") === 1, col("cents"))).as("y1"),
        max(when(col("idx") === col("m") - horizon, col("cents"))).as("yT"))
    // trunc-toward-zero integer division on BOTH engines: Spark `div`
    // truncates; the DuckDB twin wraps `//` in the same sign split so
    // a declining series (negative slope numerator) cannot diverge
    val drift = expr(
      """yT + (CASE WHEN yT - y1 >= 0
        |  THEN ((idx - (m - h)) * (yT - y1)) div (m - h - 1)
        |  ELSE -(((idx - (m - h)) * (y1 - yT)) div (m - h - 1)) END)
        |""".stripMargin)
    val errs = ser.where(col("idx") > col("m") - horizon)
      .join(broadcast(anchors), "nk")
      .withColumn("h", lit(horizon.toLong))
      .withColumn("drift", drift)
      .groupBy(col("nk"))
      .agg(count(lit(1)).as("n_test"),
        sum(abs(col("cents") - col("snv"))).as("sae_snaive_cents"),
        sum(abs(col("cents") - col("drift"))).as("sae_drift_cents"))
    Tables.nation(spark, dir)
      .join(broadcast(errs), col("n_nationkey") === col("nk"))
      .select(col("n_name"), col("n_test"),
        col("sae_snaive_cents"), col("sae_drift_cents"),
        round(col("sae_snaive_cents").cast("double") /
          (col("n_test") * 100).cast("double"), 6).as("mae_snaive"),
        round(col("sae_drift_cents").cast("double") /
          (col("n_test") * 100).cast("double"), 6).as("mae_drift"),
        when(col("sae_drift_cents") < col("sae_snaive_cents"), "drift")
          // a nation whose every test month lacks a y_{t−12} has NULL
          // snaive SAE — drift is the only defined method
          .when(col("sae_snaive_cents").isNull, "drift")
          .otherwise("snaive").as("best_method"))
      .orderBy(col("n_name"))
  }
}
