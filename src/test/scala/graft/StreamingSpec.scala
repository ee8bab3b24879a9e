package graft

import graft.streaming.EventStream
import graft.ops.Events

class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts == batch tumbling counts on the same input") {
    val stream = EventStream.readEvents(spark, sf)
    assert(stream.isStreaming)
    val q = EventStream.tumblingCounts(stream)
      .writeStream
      .format("memory")
      .queryName("stream_tumbling")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("stream_tumbling")
      .orderBy("hour_start", "event_type")
      .collect()
    val want = Events.tumblingCounts(spark, sf)
      .select("hour_start", "event_type", "n_events", "sum_value")
      .collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("streaming session_window sessions == batch sessionize on the same input") {
    import org.apache.spark.sql.functions._
    val stream = EventStream.readEvents(spark, sf)
    val q = EventStream.sessionCounts(stream)
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_sessions")
      .orderBy("user_id", "session_start").collect()
    val want = Events.sessionize(spark, sf)
      .select("user_id", "session_start", "n_events", "sum_value")
      .orderBy("user_id", "session_start").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("streaming dedup: one row per distinct event_id") {
    val stream = EventStream.readEvents(spark, sf)
    val q = EventStream.dedupEvents(stream)
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_dedup")
    val want = graft.sources.Tables.events(spark, sf)
    assert(got.count() === want.select("event_id").distinct().count())
    assert(got.select("event_id").distinct().count() === got.count())
  }

  test("flatMapGroupsWithState gap sessions == batch sessionize") {
    import org.apache.spark.sql.functions._
    val stream = EventStream.readEvents(spark, sf)
    val q = EventStream.gapSessionsStateful(spark, stream)
      .writeStream.format("memory").queryName("stream_gap_sessions")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_gap_sessions")
      .select(col("user_id"), col("start_ms"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = Events.sessionize(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(to_timestamp(session_start)) DIV 1000").as("start_ms"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "start_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("mapGroupsWithState running totals == batch per-user totals") {
    import org.apache.spark.sql.functions._
    val stream = EventStream.readEvents(spark, sf)
    val q = EventStream.userTotalsStateful(spark, stream)
      .writeStream.format("memory").queryName("stream_user_totals")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // last update per user must equal the batch totals
    val got = spark.table("stream_user_totals")
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("sum_value").as("sum_value"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), math.rint(r.getDouble(2) * 100) / 100))).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (u, (n, s)) =>
      assert(got(u)._1 === n, s"user $u count")
      assert(math.abs(got(u)._2 - s) < 1e-9, s"user $u sum")
    }
  }
}
