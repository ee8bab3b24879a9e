package graft

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries
import graft.sources.Tables

class TimeSeriesSpec extends SparkSpec {

  test("forecast backtest equals a driver-side replay of both methods") {
    val out = TimeSeries.revenueForecastBacktest(spark, sf).collect()
    assert(out.nonEmpty)
    // independent replay from the raw tables: integer-cents monthly
    // series, seasonal-naive lag-12 and trunc-div drift, 6-month holdout
    val nat = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val names = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val monthly = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .collect()
      .map { r =>
        val d = r.getTimestamp(1).toLocalDateTime
        ((nat(r.getLong(0)), d.getYear * 12 + d.getMonthValue),
          math.floor(r.getDouble(2) * 100 + 0.5).toLong)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = monthly.keys.map(_._1).toSeq.distinct.flatMap { nk =>
      val pairs = monthly.collect { case ((n, mk), c) if n == nk => (mk, c) }
        .toSeq.sortBy(_._1)
      val byMk = pairs.toMap
      val ser = pairs.map(_._2)
      val m = ser.length
      if (m < 18) None else {
        val t = m - 6
        val (y1, yT) = (ser.head, ser(t - 1))
        val errs = ((t + 1) to m).map { idx =>
          val (mk, actual) = pairs(idx - 1)
          // seasonal reference keyed on the CALENDAR month (mk − 12);
          // a gap month yields no seasonal term for mk, matching the
          // engine's NULL-skipping SAE (round-7 ADVICE fix)
          val snv = byMk.get(mk - 12)
          val num = (idx - t).toLong * (yT - y1)
          val drift = yT + (if (num >= 0) num / (t - 1) else -(-num / (t - 1)))
          (snv.map(s => math.abs(actual - s)), math.abs(actual - drift))
        }
        val sErrs = errs.flatMap(_._1)
        val saeS = if (sErrs.isEmpty) None else Some(sErrs.sum)
        val saeD = errs.map(_._2).sum
        def mae(s: Long) = math.floor(s / 600.0 * 1e6 + 0.5) / 1e6
        Some((names(nk), 6L, saeS, saeD, saeS.map(mae), mae(saeD),
          if (saeS.forall(saeD < _)) "drift" else "snaive"))
      }
    }.sortBy(_._1)
    val got = out.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)),
      r.getDouble(5), r.getString(6))).toSeq
    assert(got === expect)
    // both methods beat nothing: n_test fixed at the horizon
    assert(out.forall(_.getLong(1) === 6L))
  }

  test("forecast backtest drops too-short series instead of erroring") {
    // corpus-drift guard (round-7 verdict #6): a nation with fewer than
    // 12 + horizon observed months has no defined backtest — it must be
    // EXCLUDED, not produce a wrong-lag row or an error. A horizon no
    // local corpus can satisfy (needs 132 months) empties the result.
    val out = TimeSeries.revenueForecastBacktest(spark, sf, horizon = 120)
    assert(out.count() === 0L)
    // and the operator's schema survives the empty path
    assert(out.columns.toSeq === Seq("n_name", "n_test", "sae_snaive_cents",
      "sae_drift_cents", "mae_snaive", "mae_drift", "best_method"))
  }
}
