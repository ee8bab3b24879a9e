package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("decode kernel works in code points, matching the oracle on non-ASCII") {
    val s = "héllo ✓ café"  // 2-byte and 3-byte UTF-8 chars
    val out = Multimodal.decodeBatch(
      Seq((1L, "image", s.getBytes(java.nio.charset.StandardCharsets.UTF_8))), 4).head
    val cps = s.codePoints().toArray
    assert(out.n_bytes === cps.length)           // = length(text), not byte count
    assert(out.n_bytes < s.getBytes("UTF-8").length)
    val want = BigDecimal(cps.map(_.toLong).sum.toDouble / cps.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.mean_byte === want)               // ascii()-fold mean
  }

  test("media table: binary payload matches text bytes, metadata consistent") {
    val rows = Multimodal.mediaTable(spark, sf).limit(20).collect()
    val texts = Tables.documents(spark, sf).limit(20)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val blob = r.getAs[Array[Byte]]("blob")
      assert(blob.sameElements(texts(id).getBytes("UTF-8")))
      assert(r.getAs[Int]("n_bytes") === blob.length)
      assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 16 && w < 48 && h >= 16 && h < 48)
    }
  }

  test("decode: typed dataset, one row per media, deterministic features") {
    val decoded = Multimodal.decodeAll(spark, sf, featDim = 8, batchSize = 32)
    val rows = decoded.collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { d =>
      assert(d.features.length === 8)
      assert(d.features.forall(f => f >= 0.0f && f <= 1.0f))
      assert(d.mean_byte > 0 && d.mean_byte < 256)
    }
    // batch size must not change results (kernel is per-item deterministic)
    val again = Multimodal.decodeAll(spark, sf, featDim = 8, batchSize = 7)
      .collect().map(d => d.media_id -> d.mean_byte).toMap
    rows.foreach(d => assert(again(d.media_id) === d.mean_byte))
  }

  test("frame sample: only videos, stride-4 indices within range") {
    val meta = Multimodal.mediaMeta(spark, sf).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[String]("media_type"), r.getAs[Int]("n_frames"))).toMap
    val frames = Multimodal.frameSample(spark, sf).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val (mtype, nf) = meta(r.getAs[Long]("media_id"))
      assert(mtype === "video")
      val idx = r.getAs[Int]("frame_idx")
      assert(idx >= 0 && idx < nf && idx % 4 === 0)
    }
    // every video with ≥1 frame appears
    val videos = meta.filter(_._2._1 == "video").keySet
    assert(frames.map(_.getAs[Long]("media_id")).toSet === videos)
  }

  test("resize: output box bounded by maxSide, aspect preserved") {
    val rows = Multimodal.resizeMeta(spark, sf, maxSide = 16).collect()
    rows.foreach { r =>
      val w = r.getAs[Int]("out_w"); val h = r.getAs[Int]("out_h")
      assert(w <= 16 && h <= 16 && (w === 16 || h === 16))
    }
  }
}
