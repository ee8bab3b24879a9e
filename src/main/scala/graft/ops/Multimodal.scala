package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One decoded media item. `features` is the fixed-size embedding a real
  * codec/extractor would emit (here: a deterministic fake — see
  * [[Multimodal.decodeBatch]]). */
final case class DecodedMedia(
  media_id: Long,
  media_type: String,
  n_bytes: Int,
  mean_byte: Double,
  features: Array[Float])

/** Multimodal-column pack (SURVEY.md §2.B [EXT] multimodal row): media as
  * opaque `binary` payloads + typed metadata columns, with decode /
  * feature-extract / frame-sample plumbing.
  *
  * The container has no image/audio codecs, so the *decode kernel* is a
  * clearly-marked deterministic fake ([[decodeBatch]]) — but everything
  * Spark-side is real and tested: the binary column, the metadata schema,
  * the batched `mapPartitions` execution shape (the Scala analogue of an
  * Arrow-batch Pandas UDF: per-partition iterator → fixed-size batches →
  * vectorized kernel per batch), the typed `Dataset[DecodedMedia]` result,
  * and the frame-sampling arithmetic.
  *
  * Scale: decode is embarrassingly parallel (no shuffle); the payload
  * never moves except within its partition. At 100 TB you'd bound
  * partition bytes via `spark.sql.files.maxPartitionBytes` and let the
  * batch size cap peak memory per task.
  */
object Multimodal {

  /** Media table derived from `documents`: the UTF-8 text bytes stand in
    * for an encoded payload; metadata is derived deterministically so the
    * oracle can replay it. Columns: media_id, media_type ∈
    * {image,audio,video}, blob (binary), n_bytes, width, height,
    * n_frames. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("blob"),
        length(col("text")).cast("int").as("n_bytes"))
      .withColumn("width", (lit(16) + pmod(col("n_bytes"), lit(32))).cast("int"))
      .withColumn("height",
        (lit(16) + pmod(floor(col("n_bytes") / lit(7)), lit(32))).cast("int"))
      .withColumn("n_frames",
        when(col("media_type") === "video", lit(1) + pmod(col("n_bytes"), lit(24)))
          .otherwise(lit(1)).cast("int"))

  /** Metadata projection — oracle-checkable (pure arithmetic, no blob). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select("media_id", "media_type", "n_bytes", "width", "height", "n_frames")
      .orderBy("media_id")

  /** Frame sampling: every `step`-th frame index per video — explode so
    * the result is flat rows (portable to the oracle, no array-format
    * skew between engines). */
  def frameSample(spark: SparkSession, dir: String, step: Int = 4): DataFrame =
    mediaTable(spark, dir)
      .where(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** The decode kernel a real deployment would swap for an image/audio
    * codec (STUB: the real `decodeImage(bytes): Array[Float]` is
    * unavailable in this container — this deterministic fake keeps the
    * whole execution path testable). Operates on a *batch* so a
    * vectorized library call drops in unchanged.
    *
    * Units: the payload is UTF-8 text standing in for an encoded blob, so
    * the kernel decodes it and works in *code points* — the same unit as
    * the metadata columns (`length(text)`) and the DuckDB oracle's
    * `ascii()` fold. Counting raw bytes instead diverges on any non-ASCII
    * document (round-2 ADVICE); `n_bytes` keeps its name for schema
    * stability and equals the byte length for ASCII payloads. */
  private[graft] def decodeBatch(batch: Seq[(Long, String, Array[Byte])],
                               featDim: Int): Seq[DecodedMedia] =
    batch.map { case (id, mtype, bytes) =>
      val cps = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .codePoints().toArray
      val n = cps.length
      if (n == 0) DecodedMedia(id, mtype, 0, 0.0, Array.fill(featDim)(0.0f))
      else {
      val sum = cps.foldLeft(0L)(_ + _)
      val mean = BigDecimal(sum.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val feats = Array.tabulate(featDim) { i =>
        (cps(i * math.max(1, n / featDim) % n) & 0xff) / 255.0f
      }
      DecodedMedia(id, mtype, n, mean, feats)
      }
    }

  /** Decode all media: batched `mapPartitions`, no shuffle, typed output.
    * `batchSize` mirrors an Arrow batch — the kernel sees a block of
    * rows, not one row at a time. */
  def decodeAll(spark: SparkSession, dir: String, featDim: Int = 8,
                batchSize: Int = 64): Dataset[DecodedMedia] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("media_id"), col("media_type"), col("blob"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(it =>
        it.grouped(batchSize).flatMap(b => decodeBatch(b, featDim)))
  }

  /** Decoded summary — oracle-checkable because the fake kernel's
    * arithmetic (byte count + mean byte) is replayable in SQL; a real
    * codec's features would make this rows-only. */
  def decodeSummary(spark: SparkSession, dir: String): DataFrame =
    decodeAll(spark, dir)
      .select(col("media_id"), col("n_bytes"), col("mean_byte"))
      .orderBy(col("media_id"))

  /** "Resize": recompute metadata for a target box preserving aspect —
    * pure column arithmetic over the metadata (a real impl would also
    * rewrite the blob in [[decodeBatch]]'s kernel). */
  def resizeMeta(spark: SparkSession, dir: String, maxSide: Int = 16): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"), col("width"), col("height"))
      .withColumn("scale",
        lit(maxSide.toDouble) / greatest(col("width"), col("height")))
      .select(col("media_id"),
        floor(col("width") * col("scale")).cast("int").as("out_w"),
        floor(col("height") * col("scale")).cast("int").as("out_h"))
      .orderBy(col("media_id"))
}
