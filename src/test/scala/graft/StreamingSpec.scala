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
}
