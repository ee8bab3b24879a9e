package graft

import org.apache.spark.sql.functions._

import graft.ops.Events
import graft.sources.Tables

class EventsSpec extends SparkSpec {

  test("events reader: nanos converted to exact micros timestamps") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType.typeName === "timestamp")
    val bounds = df.agg(min("ts").cast("string"), max("ts").cast("string")).collect().head
    assert(bounds.getString(0) === "2024-01-01 00:09:58.778549")
    assert(bounds.getString(1) === "2024-01-30 23:26:16.220708")
  }

  test("tumbling windows: event counts conserved, starts aligned to the hour") {
    val df = Events.tumblingCounts(spark, sf).cache()
    assert(df.agg(sum("n_events")).collect().head.getLong(0) ===
      Tables.events(spark, sf).count())
    assert(df.filter(!col("hour_start").endsWith("00:00.000000")).count() === 0)
  }

  test("sliding windows double-count each event exactly twice") {
    val total = Events.slidingValue(spark, sf)
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(total === 2 * Tables.events(spark, sf).count())
  }

  test("sessions: events conserved, session gaps respected") {
    val sess = Events.sessionize(spark, sf).cache()
    assert(sess.agg(sum("n_events")).collect().head.getLong(0) ===
      Tables.events(spark, sf).count())
    // at least one user has multiple sessions over a month of events
    assert(sess.groupBy("user_id").count().filter(col("count") > 1).count() > 0)
  }

  test("lag features: first event per user has null lags, rn is dense per user") {
    val df = Events.lagFeatures(spark, sf).cache()
    val firsts = df.filter(col("rn") === 1)
    assert(firsts.filter(col("prev_value").isNotNull || col("gap_ms").isNotNull
      || col("roll3").isNotNull).count() === 0)
    val maxRn = df.groupBy("user_id").agg(max("rn").as("mx"), count(lit(1)).as("n"))
    assert(maxRn.filter(col("mx") =!= col("n")).count() === 0)
  }

  test("as-of join: last prior click value matches a hand walk per user") {
    val df = Events.asofLastClick(spark, sf).cache()
    assert(df.count() === Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count())
    // hand-walk one user's click/purchase timeline
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_id", "user_id", "ts", "value", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3), r.getString(4)))
    val someUser = ev.collect { case (_, u, _, _, "purchase") => u }.head
    val timeline = ev.filter(_._2 == someUser)
      .sortBy(e => (e._3.getTime, e._1))
    var lastClick: Option[Double] = None
    val expected = scala.collection.mutable.Map[Long, Option[Double]]()
    timeline.foreach { case (id, _, _, v, t) =>
      if (t == "purchase") expected(id) = lastClick
      if (t == "click") lastClick = Some(v)
    }
    val got = df.filter(col("user_id") === someUser).collect()
      .map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("last_click_value")).map(_.toDouble)).toMap
    expected.foreach { case (id, exp) =>
      val g = got(id)
      (exp, g) match {
        case (None, None) =>
        case (Some(e), Some(a)) => assert(math.abs(e - a) < 0.005 + 1e-9)
        case _ => fail(s"purchase $id: expected $exp got $g")
      }
    }
  }

  test("trailing 1h window: includes self, bounded by per-user totals") {
    val df = Events.trailingHourSum(spark, sf).cache()
    assert(df.count() === Tables.events(spark, sf).count())
    assert(df.filter(col("trail_1h_n") < 1).count() === 0)
    val perUserMax = df.groupBy("user_id").agg(max("trail_1h_n").as("mx"))
    val perUserTotal = Tables.events(spark, sf).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    assert(perUserMax.join(perUserTotal, "user_id")
      .filter(col("mx") > col("n")).count() === 0)
  }

  test("binned range join equals the naive BETWEEN join") {
    val binned = Events.sessionEventOverlap(spark, sf, maxUser = 20)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // naive interval-containment join as the semantic reference, over the
    // SAME shared interval definition (Events.gapSessionIntervals)
    val ev = Tables.events(spark, sf)
    val naive = Events.gapSessionIntervals(spark, sf, maxUser = 20)
      .join(ev.select(col("ts")),
        col("ts") >= col("s_start") && col("ts") <= col("s_end"))
      .groupBy(col("s_user"), col("s_start"))
      .agg(count(lit(1)).as("n"))
      .select(col("s_user"),
        date_format(col("s_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(binned === naive)
  }

  test("json props: k parsed for every row, bounds sane") {
    val r = Events.jsonPropsAgg(spark, sf)
      .agg(sum("n").as("n"), min("min_k").as("mn"), max("max_k").as("mx"))
      .collect().head
    assert(r.getAs[Long]("n") === Tables.events(spark, sf).count())
    assert(r.getAs[Long]("mn") >= 0 && r.getAs[Long]("mx") <= 100)
  }
}
