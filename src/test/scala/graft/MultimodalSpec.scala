package graft

import org.apache.spark.sql.functions._

import graft.ops.{MediaPayload, Multimodal}
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("BMP codec round-trips pixels exactly through javax.imageio") {
    val (w, h) = (5, 3)
    val pixels = Array.tabulate(w * h)(i => (i * 17 % 256).toByte)
    val bmp = graft.ops.MediaCodec.encodeBmpGray(w, h, pixels)
    assert(bmp(0) === 'B'.toByte && bmp(1) === 'M'.toByte)
    val (dw, dh, decoded) = graft.ops.MediaCodec.decodeImageGray(bmp)
    assert(dw === w && dh === h)
    assert(decoded.toSeq === pixels.map(_ & 0xff).toSeq)   // row-major, exact
  }

  test("WAV codec round-trips samples exactly through javax.sound") {
    val samples = Array.tabulate(300)(i => (i % 256).toByte)
    val wav = graft.ops.MediaCodec.encodeWavPcm8(samples)
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    val decoded = graft.ops.MediaCodec.decodeWavPcm8(wav)
    assert(decoded.toSeq === samples.map(_ & 0xff).toSeq)
  }

  test("decode kernel parses real containers; units derive from code points") {
    val s = "héllo ✓ café"  // 2-byte and 3-byte UTF-8 chars
    val cps = s.codePoints().toArray
    val (w, h) = (4, 3)
    val img = MediaPayload(1L, "image", graft.ops.MediaCodec.encodeBmpGray(w, h,
      Array.tabulate(w * h)(i => (cps(i % cps.length) & 0xff).toByte)), w, h)
    val wav = MediaPayload(2L, "audio", graft.ops.MediaCodec.encodeWavPcm8(
      cps.map(c => (c & 0xff).toByte)), 0, 0)
    val Seq(di, da) = Multimodal.decodeBatch(Seq(img, wav), 4,
      new graft.ops.MediaCodec.ImageDecodeScratch,
      new graft.ops.MediaCodec.WavDecodeScratch)
    assert(di.n_units === w * h)
    val wantImg = BigDecimal((0 until w * h).map(i => (cps(i % cps.length) & 0xff).toLong)
      .sum.toDouble / (w * h)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(di.mean_unit === wantImg)
    assert(da.n_units === cps.length)            // one sample per code point
    val wantAud = BigDecimal(cps.map(c => (c & 0xff).toLong).sum.toDouble / cps.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(da.mean_unit === wantAud)
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

  test("media binary: every payload is a genuine BMP or WAV container") {
    val rows = Multimodal.mediaBinary(spark, sf).limit(30).collect()
    assert(rows.nonEmpty)
    rows.foreach { m =>
      val magic = new String(m.payload.take(4).map(b => (b & 0xff).toChar))
      if (m.media_type == "audio") assert(magic === "RIFF", m.media_id)
      else {
        assert(magic.startsWith("BM"), m.media_id)
        // and the JDK's own decoder agrees on the dimensions
        val (w, h, _) = graft.ops.MediaCodec.decodeImageGray(m.payload)
        assert(w === m.width && h === m.height)
      }
    }
  }

  test("decode: typed dataset, one row per media, deterministic features") {
    val decoded = Multimodal.decodeAll(spark, sf, featDim = 8, batchSize = 32)
    val rows = decoded.collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { d =>
      assert(d.features.length === 8)
      assert(d.features.forall(f => f >= 0.0f && f <= 1.0f))
      assert(d.mean_unit > 0 && d.mean_unit < 256)
    }
    // batch size must not change results (kernel is per-item deterministic)
    val again = Multimodal.decodeAll(spark, sf, featDim = 8, batchSize = 7)
      .collect().map(d => d.media_id -> d.mean_unit).toMap
    rows.foreach(d => assert(again(d.media_id) === d.mean_unit))
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

  test("audio features: windows cover every sample, hand recompute for one doc") {
    val out = Multimodal.audioFeatures(spark, sf).collect()
    assert(out.nonEmpty)
    // per-media sample conservation: window sizes sum to the sample count
    val audioDocs = Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(3)) === 1)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byMedia = out.groupBy(_.getAs[Long]("media_id"))
    assert(byMedia.keySet === audioDocs.keySet)
    byMedia.foreach { case (id, rows) =>
      val total = rows.map(_.getAs[Long]("n_samples")).sum
      assert(total === math.max(1, audioDocs(id).codePoints().count()), s"media $id")
      // win_ids dense from 0
      assert(rows.map(_.getAs[Long]("win_id")).sorted.toSeq ===
        (0L until rows.length).toSeq)
      rows.foreach { r =>
        assert(r.getAs[Double]("rms") >= 0.0 && r.getAs[Double]("rms") <= 128.0)
        val z = r.getAs[Double]("zcr"); assert(z >= 0.0 && z <= 1.0)
      }
    }
    // hand-walk the first window of one media item
    val (id0, text0) = audioDocs.minBy(_._1)
    val x = text0.codePoints().toArray.map(cp => (cp & 255) - 128)
    val w0 = x.take(64)
    val rms = math.sqrt(w0.map(v => v.toDouble * v).sum / w0.length)
    val got = out.filter(r => r.getAs[Long]("media_id") == id0 &&
      r.getAs[Long]("win_id") == 0L).head
    assert(math.abs(got.getAs[Double]("rms") - rms) < 1e-5)
  }

  test("image features: one row per non-audio item, hand recompute for one doc") {
    val out = Multimodal.imageFeatures(spark, sf).collect()
    val imgDocs = Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(3)) =!= 1)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.map(_.getLong(0)).toSet === imgDocs.keySet)
    out.foreach { r =>
      assert(r.getAs[Double]("mean_px") >= 0.0 && r.getAs[Double]("mean_px") <= 255.0)
      assert(r.getAs[Double]("contrast") >= 0.0)
      assert(r.getAs[Double]("edge_density") >= 0.0)
    }
    // hand recompute one doc from the published pixel rule
    val (id0, t0) = imgDocs.minBy(_._1)
    val cps = t0.codePoints().toArray
    val (w, h) = (16 + t0.length % 32, 16 + (t0.length / 7) % 32)
    val px = Array.tabulate(w * h)(i =>
      if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff)
    val mean = px.sum.toDouble / px.length
    val got = out.find(_.getLong(0) == id0).get
    assert(math.abs(got.getAs[Double]("mean_px") - mean) < 1e-5)
  }

  test("resize: output box bounded by maxSide, aspect preserved") {
    val rows = Multimodal.resizeMeta(spark, sf, maxSide = 16).collect()
    rows.foreach { r =>
      val w = r.getAs[Int]("out_w"); val h = r.getAs[Int]("out_h")
      assert(w <= 16 && h <= 16 && (w === 16 || h === 16))
    }
  }

  test("image dHash: codepoint replay per image; pairs equal a brute driver scan") {
    // driver replay of the whole encode->decode->sample->hash path from
    // the raw text (the same arithmetic the oracle uses)
    def replayHash(text: String): Long = {
      val cps = text.codePoints().toArray
      // code-point count, not String.length: Spark/DuckDB length() count
      // code points, and a supplementary character would shift w/h
      val n = cps.length
      val w = 16 + n % 32
      val h = 16 + (n / 7) % 32
      def pxAt(i: Int): Int = if (cps.isEmpty) 0 else cps(i % cps.length) & 0xff
      def at(r: Int, c: Int): Int =
        pxAt(((r * h) / Multimodal.dhashRows) * w + ((c * w) / Multimodal.dhashCols))
      var hash = 0L; var bit = 0
      for (r <- 0 until Multimodal.dhashRows; c <- 0 until Multimodal.dhashCols - 1) {
        if (at(r, c + 1) > at(r, c)) hash |= 1L << bit
        bit += 1
      }
      hash
    }
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .filter(_.getLong(0) % 3 != 1)
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hashes = Multimodal.imageDHash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet === texts.keySet)
    texts.foreach { case (id, t) => assert(hashes(id) === replayHash(t), id) }

    // pairs == brute hamming scan over the collected hashes (word-soup
    // images carry no near-dups at this SF, so this mostly proves the
    // banded join emits NO false positives; recall is planted below)
    val ids = hashes.keys.toArray.sorted
    val want = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j)))
      if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    val got = Multimodal.imageDHashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("image dHash pairs: planted duplicate images surface through the full pipeline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dhash").toString
    val base = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val oneOff = base.updated(5, 'x')
    // ids = 0 mod 3 so every row is image-typed in mediaTable
    Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (3L, base, "en", "s0", base.length.toLong),
      (6L, oneOff, "en", "s0", oneOff.length.toLong),
      (9L, base.reverse, "en", "s0", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Multimodal.imageDHashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // identical texts -> identical images -> the banded join finds the
    // hamming-0 pair (recall at distance 0 is guaranteed by pigeonhole)
    assert(pairs.contains((0L, 3L, 0)))
    // one flipped codepoint perturbs few adjacent orderings: the hashes
    // stay close while the reversed text drifts much further
    val h = Multimodal.imageDHash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(h(a) ^ h(b))
    assert(ham(0L, 6L) < ham(0L, 9L))
  }
}
