package graft.streaming

import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.chunk.ChunkDispatch
import graft.embed.Embedder
import graft.model.{Chunk, DocMeta}
import graft.store.ChunkStore

/** Incremental indexing over Structured Streaming — the optional
  * extension SURVEY.md §1.4 sketches (the reference has no streaming
  * surface at all): a stream of (title, text) documents is chunked and
  * embedded with the SAME typed transforms as the batch path and
  * appended to the same parquet store per micro-batch.
  *
  * `foreachBatch` gives exactly-once appends per micro-batch id under
  * checkpointing; the chunk/embed work stays a narrow flatMap on
  * executors — arrival rate scales with cores, state is zero.
  */
object StreamingIngest {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The shared per-batch transform: (title, text) → typed chunks. */
  def chunkAndEmbed(batch: DataFrame, createdAt: Timestamp,
      chunkSize: Int = 1000, chunkOverlap: Int = 200,
      dim: Int = Embedder.DefaultDim): Dataset[Chunk] = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select("title", "text").as[(String, String)]
      .flatMap { case (title, text) =>
        val sourceId = md5hex(s"stream:$title")
        val pieces = ChunkDispatch.chunk(text, None, chunkSize, chunkOverlap)
        val meta = DocMeta(sourceType = "stream", title = Some(title))
        pieces.map { p =>
          Chunk(md5hex(s"$sourceId:${p.index}"), sourceId, p.index,
            pieces.length, p.content,
            Embedder.embed(p.content, dim).map(_.toFloat), meta,
            p.boundary, createdAt)
        }
      }
  }

  /** Start the incremental indexer on a streaming (title, text) frame. */
  def start(stream: DataFrame, storePath: String, checkpoint: String,
      createdAt: Timestamp): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val chunks = chunkAndEmbed(batch, createdAt)
        ChunkStore.write(
          chunks.toDF().withColumn("sourceType",
            org.apache.spark.sql.functions.col("metadata.sourceType")),
          s"$storePath/chunks", partitionCols = Seq("sourceType"),
          mode = SaveMode.Append)
      }
      .start()
}
