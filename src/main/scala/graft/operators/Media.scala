package graft
package operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed, deterministic metadata extraction.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked stub ([[MediaStub.decode]]) — but everything Spark
  * cares about is real and tested: the binary column, the typed
  * `mapPartitions` batch shape (executor-side, streaming per
  * partition — no collect), the metadata schema, and the
  * deterministic md5-derived values that let a DuckDB oracle verify
  * the plumbing end to end. Swapping the stub for a real decoder
  * (JavaCV, TwelveMonkeys, ffmpeg-cli per partition) changes ONE
  * function and no plan shape. At 100 TB this is the
  * `spark.read.format("binaryFile")` → mapPartitions(decode) →
  * metadata-table pattern.
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta"     -> (qMediaMeta _),
    "q_media_frames"   -> (qMediaFrames _),
    "q_media_features" -> (qMediaFeatures _),
    "q_media_resize"   -> (qMediaResize _),
  )

  val oracles: Map[String, String] = Map(
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
