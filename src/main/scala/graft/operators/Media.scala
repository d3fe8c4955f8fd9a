package graft
package operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed, deterministic metadata extraction.
  *
  * Two tiers. Formats that need no native libs get REAL codecs, pure
  * JVM: [[wavDecode]] walks RIFF/WAVE chunks and re-signs PCM16LE
  * samples; [[bmpDecode]] reads BITMAPINFOHEADER fields and walks the
  * bottom-up 4-byte-padded pixel rows — and their oracle rows verify
  * the full encode→decode roundtrip byte-for-byte (the DuckDB side
  * recomputes the expected metadata/features analytically). Formats
  * that genuinely need native codecs (JPEG/H.264) keep the
  * clearly-marked stub ([[MediaStub.decode]]) as the single swap
  * point — the binary column, the typed `mapPartitions` batch shape
  * (executor-side, streaming per partition — no collect), and the
  * metadata schema are identical in both tiers, so swapping in
  * JavaCV/ffmpeg-cli changes ONE function and no plan shape. At
  * 100 TB this is the `spark.read.format("binaryFile")` →
  * mapPartitions(decode) → metadata-table pattern.
  */
object Media {

  /** Typed metadata row produced per media object. */
  case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      content_hash: String,
      mime: String,
      width: Long,
      height: Long,
      frames: Long)

  /** The decode stub: parses NOTHING from the payload except its bytes;
    * emits md5-derived pseudo-dimensions so results are deterministic
    * and cross-engine checkable. A real implementation would replace
    * the body (only) with an actual codec probe. */
  object MediaStub {
    def decode(docId: Long, bytes: Array[Byte], md: MessageDigest): MediaMeta = {
      md.reset()
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      def field(from: Int, mod: Long): Long =
        java.lang.Long.parseLong(hex.substring(from, from + 4), 16) % mod
      val mime = (bytes.length % 3) match {
        case 0 => "image/png"
        case 1 => "audio/wav"
        case _ => "video/mp4"
      }
      val frames = mime match {
        case "video/mp4" => field(8, 240) + 1
        case "image/png" => 1L
        case _           => 0L
      }
      MediaMeta(docId, bytes.length.toLong, hex, mime,
        field(0, 1280) + 1, field(4, 720) + 1, frames)
    }
  }

  /** Binary-column metadata extraction over the documents table (text
    * re-encoded as the stand-in payload): typed mapPartitions, one
    * digest instance per partition, streaming iterator — the batch
    * shape a Pandas-UDF/`mapInPandas` pipeline would use. */
  def qMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => MediaStub.decode(id, bytes, md) }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling (1 media row → N frame rows, the UDTF shape):
    * every 24th frame of each pretend-video at 25 fps → exact 40 ms
    * timestamps. A real decoder swaps into the same explode. */
  def qMediaFrames(spark: SparkSession, dir: String): DataFrame =
    qMediaMeta(spark, dir)
      .filter(col("mime") === "video/mp4")
      .select(col("doc_id"), col("frames"),
        explode(sequence(lit(0L), col("frames") - 1, lit(24L))).as("frame_no"))
      .withColumn("ts_ms", col("frame_no") * 40)
      .select("doc_id", "frame_no", "ts_ms")
      .orderBy("doc_id", "frame_no")

  case class MediaFeatures(doc_id: Long, bucket: Int, n: Long, weight: Double)

  /** Feature extraction over the binary payload: 8-bucket byte
    * histogram per object, normalized to exact count/total quotients —
    * REAL executor-side computation in the typed mapPartitions batch
    * shape (an image embedder swaps into the same function). */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val counts = new Array[Long](8)
        bytes.foreach(b => counts((b & 0xff) % 8) += 1)
        val total = bytes.length.toDouble
        counts.zipWithIndex.collect {
          case (n, bucket) if n > 0 =>
            MediaFeatures(id, bucket, n, n / total)
        }
      }
      .toDF()
      .withColumn("weight", round(col("weight"), 6))
      .orderBy("doc_id", "bucket")
  }

  case class ResizedMedia(
      doc_id: Long,
      width: Long,
      height: Long,
      out_width: Long,
      out_height: Long,
      out_bytes: Long,
      resample_hash: String)

  /** Aspect-preserving fit of (w, h) into a `box`×`box` square — pure
    * integer arithmetic (floor division, clamp to ≥1) so the geometry
    * is bit-reproducible. */
  private[graft] def fitBox(w: Long, h: Long, box: Long): (Long, Long) = {
    val m = math.max(w, h)
    if (m <= box) (w, h)
    else (math.max(1L, w * box / m), math.max(1L, h * box / m))
  }

  /** Resize step of the multimodal pipeline (decode → RESIZE →
    * embed): geometry is real integer math ([[fitBox]] into a 224 box,
    * the standard vision-model input); the pixel resample is the stub —
    * a stride subsample of the payload bytes hashed to md5, standing in
    * for the interpolated pixel buffer a real codec would emit. Output
    * size is the exact RGB buffer a 224-fit image would occupy
    * (`out_w·out_h·3`). Same typed mapPartitions batch shape as
    * [[qMediaMeta]]; a JavaCV/ffmpeg resize swaps into the same
    * function with no plan change. */
  def qMediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qMediaMeta(spark, dir)
      .filter(col("mime") === "image/png")
      .select(col("doc_id"), col("width"), col("height"))
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("data")), "doc_id")
      .select(col("doc_id"), col("width"), col("height"), col("data"))
      .as[(Long, Long, Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, w, h, bytes) =>
          val (ow, oh) = fitBox(w, h, 224L)
          val stride = math.max(1L, bytes.length.toLong / 64L).toInt
          val sampled = bytes.indices.by(stride).map(bytes(_)).toArray
          md.reset()
          val hex = md.digest(sampled).map("%02x".format(_)).mkString
          ResizedMedia(id, w, h, ow, oh, ow * oh * 3, hex)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  // Real codecs (pure JVM — no external libs): WAV PCM and BMP. The
  // payloads are synthesized deterministically per doc, but as REAL
  // well-formed files, and the decode path parses the BYTES back
  // (RIFF chunk walk, BMP header + 4-byte row padding) — it never
  // peeks at the synth parameters. The DuckDB oracle computes the
  // same metadata/features analytically from the synth formulas, so a
  // hash-exact oracle row proves the encoder→decoder roundtrip,
  // including every little-endian offset. MediaStub remains the swap
  // point for codecs that genuinely need native libs (JPEG/H.264).
  // ------------------------------------------------------------------

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
  }
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    rd16(b, off) | (rd16(b, off + 2) << 16)

  /** 16-bit mono PCM sample i of doc `docId`: ((id·31 + i·7) mod 4096)
    * − 2048 — spans negative/positive so zero-crossings are real. */
  private[graft] def wavSample(docId: Long, i: Int): Int =
    (((docId * 31 + i * 7) % 4096) - 2048).toInt

  /** Real RIFF/WAVE writer: 44-byte canonical header + PCM16LE data. */
  private[graft] def wavBytes(docId: Long, nSamples: Int): Array[Byte] = {
    val rate = 8000
    val data = nSamples * 2
    val b = new Array[Byte](44 + data)
    "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
    le32(b, 4, 36 + data)
    "WAVEfmt ".getBytes("US-ASCII").copyToArray(b, 8)
    le32(b, 16, 16); le16(b, 20, 1); le16(b, 22, 1) // PCM, mono
    le32(b, 24, rate); le32(b, 28, rate * 2)        // byte rate
    le16(b, 32, 2); le16(b, 34, 16)                 // block align, bits
    "data".getBytes("US-ASCII").copyToArray(b, 36)
    le32(b, 40, data)
    var i = 0
    while (i < nSamples) { le16(b, 44 + 2 * i, wavSample(docId, i) & 0xffff); i += 1 }
    b
  }

  case class WavMeta(
      doc_id: Long, sample_rate: Long, channels: Long, bits: Long,
      n_samples: Long, duration_ms: Long, sum_sq: Long, zcr: Long,
      rms: Double)

  /** Real RIFF parse: chunk magics checked, fmt fields read from the
    * bytes, PCM16LE samples re-signed; RMS/zero-crossings from the
    * decoded waveform (exact integer sums; sqrt at the very end). */
  private[graft] def wavDecode(docId: Long, b: Array[Byte]): WavMeta = {
    require(new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 8, "US-ASCII") == "WAVEfmt ", s"bad RIFF: doc $docId")
    require(rd16(b, 20) == 1, "not PCM")
    val channels = rd16(b, 22)
    val rate = rd32(b, 24)
    val bits = rd16(b, 34)
    require(new String(b, 36, 4, "US-ASCII") == "data", "missing data chunk")
    val dataLen = rd32(b, 40)
    val n = dataLen / (bits / 8) / channels
    var i = 0; var sumSq = 0L; var zcr = 0L; var prevNeg = false
    while (i < n) {
      val raw = rd16(b, 44 + 2 * i)
      val s = if (raw >= 0x8000) raw - 0x10000 else raw // re-sign
      sumSq += s.toLong * s
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zcr += 1
      prevNeg = neg
      i += 1
    }
    WavMeta(docId, rate, channels, bits, n, n.toLong * 1000 / rate, sumSq,
      zcr, math.sqrt(sumSq.toDouble / n)) // rounded at the plan layer
  }

  /** Audio decode + feature extraction with a REAL codec end to end:
    * synthesize a well-formed WAV per doc (100–199 samples, length
    * keyed by n_chars), parse the bytes back, emit decoded header
    * fields + integer-exact waveform features. The oracle recomputes
    * everything analytically — a hash match proves the roundtrip. */
  def qWavDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), (lit(100) + col("n_chars") % 100).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, n) => wavDecode(id, wavBytes(id, n)) })
      .toDF()
      .withColumn("rms", round(col("rms"), 6))
      .orderBy("doc_id")
  }

  /** 24-bit BMP pixel channels of doc `docId` at (x, y). */
  private[graft] def bmpPixel(docId: Long, x: Int, y: Int): (Int, Int, Int) =
    (((docId + x + y) % 256).toInt, ((docId * 2 + x) % 256).toInt,
      ((docId + x.toLong * y) % 256).toInt)

  /** Real BMP writer: BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp,
    * bottom-up rows padded to 4 bytes — the classic stride gotcha. */
  private[graft] def bmpBytes(docId: Long, w: Int, h: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val b = new Array[Byte](54 + stride * h)
    b(0) = 'B'; b(1) = 'M'
    le32(b, 2, b.length); le32(b, 10, 54)
    le32(b, 14, 40); le32(b, 18, w); le32(b, 22, h)
    le16(b, 26, 1); le16(b, 28, 24)
    le32(b, 34, stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, bl) = bmpPixel(docId, x, y)
        val off = 54 + (h - 1 - y) * stride + x * 3 // bottom-up, BGR
        b(off) = bl.toByte; b(off + 1) = g.toByte; b(off + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  case class BmpMeta(
      doc_id: Long, width: Long, height: Long, bpp: Long, byte_len: Long,
      r_sum: Long, g_sum: Long, b_sum: Long, brightness_milli: Long)

  /** Real BMP parse: header fields read back from the bytes, pixels
    * walked bottom-up through the padded stride; channel sums exact. */
  private[graft] def bmpDecode(docId: Long, b: Array[Byte]): BmpMeta = {
    require(b(0) == 'B' && b(1) == 'M', s"bad BMP magic: doc $docId")
    val off = rd32(b, 10)
    val w = rd32(b, 18); val h = rd32(b, 22)
    val bpp = rd16(b, 28)
    require(bpp == 24, "only 24bpp supported")
    val stride = ((w * 3 + 3) / 4) * 4
    var rs = 0L; var gs = 0L; var bs = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = off + (h - 1 - y) * stride + x * 3
        bs += b(p) & 0xff; gs += b(p + 1) & 0xff; rs += b(p + 2) & 0xff
        x += 1
      }
      y += 1
    }
    BmpMeta(docId, w, h, bpp, b.length.toLong, rs, gs, bs,
      (rs + gs + bs) * 1000 / (3L * w * h * 255))
  }

  /** PCM16 samples re-signed straight from a decoded RIFF data chunk
    * — the waveform accessor [[wavDecode]]'s feature loop walks,
    * factored for the band-correlation pass. */
  private[graft] def wavSamples(b: Array[Byte]): Array[Int] = {
    require(new String(b, 36, 4, "US-ASCII") == "data", "missing data chunk")
    val n = rd32(b, 40) / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val raw = rd16(b, 44 + 2 * i)
      out(i) = if (raw >= 0x8000) raw - 0x10000 else raw
      i += 1
    }
    out
  }

  /** Spectral bands for [[qAudioFp]]: frequencies whose period divides
    * the 8 kHz sample rate EXACTLY (P = 16, 8, 4 samples), so the
    * correlation index is `i mod P` and the quadrature tables are
    * finite. Tables are `round(1024·cos/sin(2πj/P))` — computed once
    * here and INTERPOLATED INTO THE ORACLE SQL as literals, so engine
    * and oracle share one source of truth with zero trig at query
    * time. */
  private[graft] val FpBands: Seq[(Int, Array[Long], Array[Long])] =
    Seq(500, 1000, 2000).map { f =>
      val p = 8000 / f
      (f,
        Array.tabulate(p)(j => math.round(1024.0 * math.cos(2 * math.Pi * j / p))),
        Array.tabulate(p)(j => math.round(1024.0 * math.sin(2 * math.Pi * j / p))))
    }

  case class AudioFp(doc_id: Long, f_hz: Long, c: Long, s: Long, energy: Long)

  /** Quadrature band correlation of a decoded waveform — exact
    * integer: c = Σ vᵢ·ct[i mod P], s = Σ vᵢ·st[i mod P],
    * energy = c² + s² (≤ 3.5e17 at the synthesis amplitude/length,
    * well inside a long). */
  private[graft] def bandFp(docId: Long, v: Array[Int]): Seq[AudioFp] =
    FpBands.map { case (f, ct, st) =>
      val p = ct.length
      var c = 0L; var s = 0L; var i = 0
      while (i < v.length) {
        c += v(i) * ct(i % p); s += v(i) * st(i % p)
        i += 1
      }
      AudioFp(docId, f, c, s, c * c + s * s)
    }

  /** Audio spectral fingerprint over REAL decoded WAV bytes — the
    * Shazam-family primitive (Wang 2003: constellation of spectral
    * peaks; this is the per-band energy table those peaks come from):
    * each clip's PCM16 waveform is correlated against integer
    * quadrature tables at 500/1000/2000 Hz, giving exact per-band
    * energies whose equality is the audio near-dup key (AudioFpSpec
    * plants a same-waveform pair and a pure tone that must
    * concentrate in its own band). Row-local flatMap — decode and
    * all three bands in one pass over each clip's samples, 3 output
    * rows per doc, no shuffle before the final order. At 100 TB the
    * binary column streams through executors without ever being
    * row-exploded. */
  def qAudioFp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), (lit(100) + col("n_chars") % 100).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions(_.flatMap { case (id, n) =>
        bandFp(id, wavSamples(wavBytes(id, n)))
      })
      .toDF()
      .orderBy("doc_id", "f_hz")
  }

  /** Image decode with a REAL codec end to end: well-formed 24bpp BMP
    * per doc (geometry keyed by doc_id), parsed back byte-for-byte
    * (padding included), channel sums + fixed-point brightness. */
  def qBmpDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
        bmpDecode(id, bmpBytes(id, w, h))
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** 8-bit perceptual average-hash from REAL decoded BMP bytes: the
    * image divides into a 4×2 cell grid (cell of pixel = (x·4 div w,
    * y·2 div h) — exact on any geometry), each cell's bit is set iff
    * its mean gray exceeds the image mean. The comparison is
    * cross-multiplied (`cell_sum·total_px > total_sum·cell_px`) so
    * the hash is pure integer arithmetic — bit-identical across
    * engines and partitionings, no float mean anywhere. */
  private[graft] def bmpPhash(b: Array[Byte]): Long = {
    require(b(0) == 'B' && b(1) == 'M', "bad BMP magic")
    val off = rd32(b, 10)
    val w = rd32(b, 18); val h = rd32(b, 22)
    val stride = ((w * 3 + 3) / 4) * 4
    val cs = new Array[Long](8); val cn = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = off + (h - 1 - y) * stride + x * 3
        val gray = (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
        val ci = (y * 2 / h) * 4 + (x * 4 / w)
        cs(ci) += gray; cn(ci) += 1
        x += 1
      }
      y += 1
    }
    val ts = cs.sum; val tn = cn.sum
    (0 until 8).map(i => if (cs(i) * tn > ts * cn(i)) 1L << i else 0L).sum
  }

  /** Perceptual image dedup — the multimodal twin of
    * [[graft.operators.Dedup.qDedupExact]]: decode every image with
    * the real codec, compute the integer average-hash
    * ([[bmpPhash]]), and group by hash into perceptual duplicate
    * classes (count + canonical id). Same-looking images land in one
    * class even when their bytes differ; at 100 TB this is the
    * near-free first pass before any pairwise perceptual comparison
    * — one decode scan, one 8-bit-key shuffle, no pair blowup. */
  def qMediaPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
        (id, bmpPhash(bmpBytes(id, w, h)))
      })
      .toDF("doc_id", "phash")
      .groupBy("phash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_id"))
      .orderBy("phash")
  }

  case class DecodeStatus(doc_id: Long, status: String, n_samples: Option[Long])

  /** Error-channel decode — the production posture for a 100 TB media
    * scan where some payloads are ALWAYS corrupt: per-row try/catch in
    * the same typed mapPartitions, bad rows become ('error', null)
    * rows instead of failing the job (the IndexPipeline errors[]
    * pattern applied to the codec tier). Corruption is injected
    * deterministically (every 97th doc gets a flipped RIFF magic) so
    * the oracle can verify BOTH channels exactly. */
  def qMediaErrors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), (lit(100) + col("n_chars") % 100).cast("int").as("n"))
      .as[(Long, Int)]
      .mapPartitions(_.map { case (id, n) =>
        val bytes = wavBytes(id, n)
        if (id % 97 == 0) bytes(0) = 'X'.toByte // planted corruption
        try {
          val m = wavDecode(id, bytes)
          DecodeStatus(id, "ok", Some(m.n_samples))
        } catch {
          case _: IllegalArgumentException => DecodeStatus(id, "error", None)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_errors"   -> (qMediaErrors _),
    "q_media_meta"     -> (qMediaMeta _),
    "q_media_frames"   -> (qMediaFrames _),
    "q_media_features" -> (qMediaFeatures _),
    "q_media_resize"   -> (qMediaResize _),
    "q_wav_decode"     -> (qWavDecode _),
    "q_bmp_decode"     -> (qBmpDecode _),
    "q_media_phash"    -> (qMediaPhash _),
    "q_audio_fp"       -> (qAudioFp _),
  )

  val oracles: Map[String, String] = Map(
    "q_audio_fp" -> {
      val tab = FpBands.flatMap { case (f, ct, st) =>
        ct.indices.map(j => s"($f,$j,${ct(j)},${st(j)})")
      }.mkString(",")
      s"""WITH d AS (
        |  SELECT doc_id, 100 + n_chars % 100 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, i,
        |    ((doc_id*31 + i*7) % 4096 - 2048)::BIGINT AS v
        |  FROM d, LATERAL (SELECT unnest(range(n)) AS i) g),
        |t(f_hz, j, ct, st) AS (VALUES $tab),
        |c AS (
        |  SELECT doc_id, f_hz,
        |    sum(v * ct)::BIGINT AS c, sum(v * st)::BIGINT AS s
        |  FROM s JOIN t ON s.i % (8000 // t.f_hz) = t.j
        |  GROUP BY 1, 2)
        |SELECT doc_id, f_hz::BIGINT AS f_hz, c, s,
        |  (c*c + s*s)::BIGINT AS energy
        |FROM c ORDER BY doc_id, f_hz""".stripMargin
    },
    "q_media_errors" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 97 = 0 THEN 'error' ELSE 'ok' END AS status,
        |  CASE WHEN doc_id % 97 = 0 THEN NULL
        |       ELSE (100 + n_chars % 100)::BIGINT END AS n_samples
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_wav_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 100 + n_chars % 100 AS n FROM documents),
        |s AS (
        |  SELECT doc_id, n, i,
        |    ((doc_id*31 + i*7) % 4096 - 2048)::BIGINT AS v
        |  FROM d, LATERAL (SELECT unnest(range(n)) AS i) g),
        |z AS (
        |  SELECT doc_id, n, v,
        |    CASE WHEN i > 0 AND ((v < 0) <>
        |        (lag(v) OVER (PARTITION BY doc_id ORDER BY i) < 0))
        |      THEN 1 ELSE 0 END AS flip
        |  FROM s)
        |SELECT doc_id, 8000::BIGINT AS sample_rate, 1::BIGINT AS channels,
        |  16::BIGINT AS bits, any_value(n)::BIGINT AS n_samples,
        |  ((any_value(n)*1000)//8000)::BIGINT AS duration_ms,
        |  sum(v*v)::BIGINT AS sum_sq, sum(flip)::BIGINT AS zcr,
        |  round(sqrt(sum(v*v)::DOUBLE / any_value(n)), 6) AS rms
        |FROM z GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_bmp_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + (doc_id % 13) AS w, 3 + (doc_id % 7) AS h
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, w, h,
        |    (doc_id + x + y) % 256 AS r,
        |    (doc_id*2 + x) % 256 AS g,
        |    (doc_id + x*y) % 256 AS b
        |  FROM d, LATERAL (SELECT unnest(range(w)) AS x) gx,
        |       LATERAL (SELECT unnest(range(h)) AS y) gy)
        |SELECT doc_id, any_value(w)::BIGINT AS width,
        |  any_value(h)::BIGINT AS height, 24::BIGINT AS bpp,
        |  (54 + ((any_value(w)*3 + 3)//4)*4 * any_value(h))::BIGINT
        |    AS byte_len,
        |  sum(r)::BIGINT AS r_sum, sum(g)::BIGINT AS g_sum,
        |  sum(b)::BIGINT AS b_sum,
        |  (((sum(r)+sum(g)+sum(b)) * 1000) //
        |    (3 * any_value(w) * any_value(h) * 255))::BIGINT
        |    AS brightness_milli
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_media_phash" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + (doc_id % 13) AS w, 3 + (doc_id % 7) AS h
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, w, h, x, y,
        |    ((doc_id + x + y) % 256) + ((doc_id*2 + x) % 256) +
        |      ((doc_id + x*y) % 256) AS gray
        |  FROM d, LATERAL (SELECT unnest(range(w)) AS x) gx,
        |       LATERAL (SELECT unnest(range(h)) AS y) gy),
        |cells AS (
        |  SELECT doc_id, (x*4)//w AS cx, (y*2)//h AS cy,
        |    sum(gray) AS cs, count(*) AS cn
        |  FROM p GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, sum(cs) AS ts, sum(cn) AS tn
        |        FROM cells GROUP BY 1),
        |bits AS (
        |  SELECT c.doc_id,
        |    sum(CASE WHEN c.cs * t.tn > t.ts * c.cn
        |      THEN CAST(pow(2, c.cy*4 + c.cx) AS BIGINT) ELSE 0 END)::BIGINT
        |      AS phash
        |  FROM cells c JOIN tot t USING (doc_id) GROUP BY 1)
        |SELECT phash, count(*)::BIGINT AS n_docs, min(doc_id) AS canonical_id
        |FROM bits GROUP BY 1 ORDER BY phash""".stripMargin,
    "q_media_meta" ->
      """SELECT doc_id, strlen(text)::BIGINT AS byte_len,
        |  md5(text) AS content_hash,
        |  CASE strlen(text) % 3 WHEN 0 THEN 'image/png'
        |       WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  ('0x'||substr(md5(text),1,4))::BIGINT % 1280 + 1 AS width,
        |  ('0x'||substr(md5(text),5,4))::BIGINT % 720 + 1 AS height,
        |  CASE CASE strlen(text) % 3 WHEN 0 THEN 'image/png'
        |            WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END
        |    WHEN 'video/mp4' THEN ('0x'||substr(md5(text),9,4))::BIGINT % 240 + 1
        |    WHEN 'image/png' THEN 1 ELSE 0 END AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_frames" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ('0x'||substr(md5(text),9,4))::BIGINT % 240 + 1 AS frames
        |  FROM documents WHERE strlen(text) % 3 = 2)
        |SELECT doc_id, f AS frame_no, f * 40 AS ts_ms
        |FROM m, LATERAL (SELECT unnest(range(0, frames, 24)) AS f) g
        |ORDER BY doc_id, frame_no""".stripMargin,
    "q_media_features" ->
      """WITH b AS (
        |  SELECT doc_id, ascii(substring(text, i+1, 1)) % 8 AS bucket,
        |    strlen(text) AS total
        |  FROM documents, LATERAL (SELECT unnest(range(strlen(text))) AS i) g)
        |SELECT doc_id, bucket, count(*) AS n,
        |  round(count(*)::DOUBLE / any_value(total), 6) AS weight
        |FROM b GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,
    // text is pure ASCII (asserted by MediaSpec), so the oracle's
    // char-index sampling equals the engine's byte-index sampling
    "q_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id, text, strlen(text)::BIGINT AS len,
        |    ('0x'||substr(md5(text),1,4))::BIGINT % 1280 + 1 AS width,
        |    ('0x'||substr(md5(text),5,4))::BIGINT % 720 + 1 AS height
        |  FROM documents WHERE strlen(text) % 3 = 0),
        |g AS (
        |  SELECT doc_id, text, len, width, height,
        |    greatest(width, height) AS mx,
        |    greatest(1, len // 64) AS stride
        |  FROM m),
        |d AS (
        |  SELECT doc_id, text, stride, len, width, height,
        |    CASE WHEN mx <= 224 THEN width
        |         ELSE greatest(1, width * 224 // mx) END AS out_width,
        |    CASE WHEN mx <= 224 THEN height
        |         ELSE greatest(1, height * 224 // mx) END AS out_height
        |  FROM g),
        |s AS (
        |  SELECT doc_id, width, height, out_width, out_height,
        |    md5(string_agg(substring(text, i+1, 1), '' ORDER BY i))
        |      AS resample_hash
        |  FROM d, LATERAL (SELECT unnest(range(0, len, stride)) AS i) u
        |  GROUP BY ALL)
        |SELECT doc_id, width, height, out_width, out_height,
        |  (out_width * out_height * 3)::BIGINT AS out_bytes, resample_hash
        |FROM s ORDER BY doc_id""".stripMargin,
  )
}
