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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> (qMediaMeta _),
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
  )
}
