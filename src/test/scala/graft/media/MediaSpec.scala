package graft
package media

import java.security.MessageDigest

import org.apache.spark.sql.functions.{col, sum}

import graft.operators.Media.MediaStub

class MediaSpec extends SparkSpec {

  test("decode stub is deterministic and md5-anchored") {
    val md = MessageDigest.getInstance("MD5")
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    val m = MediaStub.decode(7L, "abc".getBytes("UTF-8"), md)
    assert(m.content_hash === "900150983cd24fb0d6963f7d28e17f72")
    assert(m.byte_len === 3L)
    assert(m.mime === "image/png") // 3 % 3 == 0
    assert(m.width === 0x9001L % 1280 + 1)
    assert(m.height === 0x5098L % 720 + 1)
    assert(m.frames === 1L)
    // stable across calls with a shared digest instance
    val m2 = MediaStub.decode(7L, "abc".getBytes("UTF-8"), md)
    assert(m === m2)
  }

  test("binary metadata query covers every doc exactly once") {
    val out = graft.operators.Media.qMediaMeta(spark, sfDir)
    assert(out.count() === Tables.documents(spark, sfDir).count())
    assert(out.select("doc_id").distinct().count() === out.count())
  }

  test("frame sampling: every video emits ≥1 frame, stride 24, ts = 40ms·frame") {
    import org.apache.spark.sql.functions._
    val frames = graft.operators.Media.qMediaFrames(spark, sfDir)
    val videos = graft.operators.Media.qMediaMeta(spark, sfDir)
      .filter(col("mime") === "video/mp4")
    // one group per video, even when frames < 24 (single frame 0)
    assert(frames.select("doc_id").distinct().count() === videos.count())
    assert(frames.filter(pmod(col("frame_no"), lit(24)) =!= 0).count() === 0)
    assert(frames.filter(col("ts_ms") =!= col("frame_no") * 40).count() === 0)
  }

  test("byte-histogram features: weights per doc sum to 1") {
    import org.apache.spark.sql.functions._
    val f = graft.operators.Media.qMediaFeatures(spark, sfDir)
    val sums = f.groupBy("doc_id").agg(sum("n").as("total"),
      sum(col("n")).cast("double").as("tn"))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    // bucket counts reconstruct the byte length exactly
    assert(sums.join(docs, "doc_id").filter(col("total") =!= col("len"))
      .count() === 0)
  }

  test("fitBox: aspect-preserving integer geometry") {
    import graft.operators.Media.fitBox
    assert(fitBox(100, 50, 224) === ((100L, 50L)))   // already fits
    assert(fitBox(448, 224, 224) === ((224L, 112L))) // halve both
    assert(fitBox(1280, 720, 224) === ((224L, 126L)))
    assert(fitBox(1, 720, 224) === ((1L, 224L)))     // clamp to ≥1
    assert(fitBox(224, 224, 224) === ((224L, 224L)))
  }

  test("resize: geometry bounded by the box, one row per image, ASCII oracle precondition") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Media.qMediaResize(spark, sfDir).cache()
    val images = graft.operators.Media.qMediaMeta(spark, sfDir)
      .filter(col("mime") === "image/png")
    assert(r.count() === images.count())
    assert(r.filter(col("out_width") > 224 || col("out_height") > 224 ||
      col("out_width") < 1 || col("out_height") < 1).count() === 0)
    // unchanged when already inside the box; scaled to touch it otherwise
    assert(r.filter(greatest(col("width"), col("height")) <= 224 &&
      (col("out_width") =!= col("width") ||
        col("out_height") =!= col("height"))).count() === 0)
    assert(r.filter(greatest(col("width"), col("height")) > 224 &&
      greatest(col("out_width"), col("out_height")) =!= 224).count() === 0)
    assert(r.filter(col("out_bytes") =!=
      col("out_width") * col("out_height") * 3).count() === 0)
    // the oracle samples by CHAR index, the engine by BYTE index: they
    // agree iff the corpus is pure ASCII — pin that precondition
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii === 0)
    r.unpersist()
  }

  test("wav codec: real RIFF roundtrip, corruption detected") {
    val b = operators.Media.wavBytes(7L, 150)
    val m = operators.Media.wavDecode(7L, b)
    assert(m.sample_rate === 8000L && m.channels === 1L && m.bits === 16L)
    assert(m.n_samples === 150L && m.duration_ms === 18L)
    // decoded waveform features equal the synth formula computed directly
    val vs = (0 until 150).map(operators.Media.wavSample(7L, _))
    assert(m.sum_sq === vs.map(v => v.toLong * v).sum)
    assert(m.zcr === vs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    // a flipped magic byte must not decode silently
    val bad = b.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](operators.Media.wavDecode(7L, bad))
  }

  test("bmp codec: padded-stride roundtrip, header read from bytes") {
    // w=5 forces a non-trivial row pad (15 bytes -> stride 16)
    val b = operators.Media.bmpBytes(1L, 5, 4)
    assert(b.length === 54 + 16 * 4)
    val m = operators.Media.bmpDecode(1L, b)
    assert(m.width === 5L && m.height === 4L && m.bpp === 24L)
    val px = for { y <- 0 until 4; x <- 0 until 5 }
      yield operators.Media.bmpPixel(1L, x, y)
    assert(m.r_sum === px.map(_._1.toLong).sum)
    assert(m.g_sum === px.map(_._2.toLong).sum)
    assert(m.b_sum === px.map(_._3.toLong).sum)
    val bad = b.clone(); bad(1) = 'X'.toByte
    intercept[IllegalArgumentException](operators.Media.bmpDecode(1L, bad))
  }

  test("wav/bmp queries: one row per doc, features positive") {
    val w = operators.Media.qWavDecode(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(w.count() === docs)
    assert(w.filter(col("sum_sq") <= 0 || col("zcr") < 0).count() === 0)
    // the slow mod-4096 ramp crosses zero in SOME docs, not all
    assert(w.filter(col("zcr") > 0).count() > 0)
    val bm = operators.Media.qBmpDecode(spark, sfDir)
    assert(bm.count() === docs)
    assert(bm.filter(col("brightness_milli") < 0 ||
      col("brightness_milli") > 1000).count() === 0)
  }

  test("phash dedup: lossless partition into 8-bit perceptual classes " +
      "that genuinely group") {
    val g = operators.Media.qMediaPhash(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(g.agg(sum("n_docs")).head.getLong(0) === docs)
    assert(g.filter(col("phash") < 0 || col("phash") > 255).count() === 0)
    // classes group (fewer classes than images) without collapsing
    // to one bucket
    val n = g.count()
    assert(n > 1 && n < docs)
  }
}
