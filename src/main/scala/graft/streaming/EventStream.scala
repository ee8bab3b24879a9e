package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Structured Streaming wrapper over the events table (SURVEY.md §2.B
  * streaming row: "a thin Structured Streaming wrapper demonstrated in
  * tests only — the DuckDB oracle can't check a live stream").
  *
  * The same logical transforms as [[graft.ops.Events]] run here on an
  * unbounded source: `readStream` over a parquet directory, event-time
  * watermark, tumbling-window aggregation. On a real cluster the source
  * would be Kafka/files landing continuously; the parquet-file source has
  * identical semantics with exactly-once file tracking.
  *
  * Scale: stateful aggregation state is bounded by the watermark horizon
  * (1 hour of windows per key); state lives in the HDFS/RocksDB state
  * store, partitioned by group key — the standard 1000-executor topology.
  */
object EventStream {

  /** Unbounded read of the events table: same nanos→micros conversion as
    * the batch reader. `pathGlobFilter` restricts to the events file so the
    * directory can hold the other corpus tables. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(Tables.eventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Streaming hourly tumbling counts per event type with a 1-hour
    * watermark — the streaming twin of [[graft.ops.Events.tumblingCounts]];
    * the spec asserts both produce identical results on the same input. */
  def tumblingCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
}
