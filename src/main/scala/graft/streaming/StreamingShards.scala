package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Streaming shard router — the ingest-side twin of the stable-hash
  * shard layout ([[Curation.qShardChurn]]'s production answer to rank
  * sharding): a document's shard is a pure hash bucket, so routing
  * needs NO state — any executor places any doc identically — and the
  * only streaming state is the running per-shard manifest (one row per
  * shard: doc count, byte total, order-invariant checksum), bounded by
  * the fixed shard count whatever the arrival rate.
  *
  * The checksum is the same Σ hash60(text) mod 2⁶⁰ the batch manifest
  * and the read-back audit use, and it is order-invariant — so the
  * final streamed manifest equals the batch manifest over the same
  * docs regardless of micro-batch arrival order
  * (StreamingShardsSpec pins it).
  */
object StreamingShards {

  /** Shared manifest aggregation — batch, streaming, and the read-back
    * audit all run [[Curation.shardManifestAgg]]'s expressions. */
  private def manifestAgg(routed: DataFrame): DataFrame =
    Curation.shardManifestAgg(routed)

  /** Route a doc stream (or batch — the transform is mode-agnostic):
    * attach the stable shard and the content hash. */
  def route(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("n_chars"),
      graft.embed.Embedder.hash60Col(col("text")).as("ch"))
      .withColumn("shard_id", Curation.stableShardCol(col("doc_id")))

  /** doc stream (doc_id, n_chars, text) → running per-shard manifest
    * (update/complete mode; state = ≤ [[Curation.StableShards]]
    * aggregate rows however many docs have streamed). */
  def manifestStream(docs: Dataset[(Long, Long, String)]): DataFrame =
    manifestAgg(route(docs.toDF("doc_id", "n_chars", "text")))

  /** The batch twin over the same schema — one groupBy, identical
    * expressions. */
  def manifestBatch(docs: DataFrame): DataFrame =
    manifestAgg(route(docs)).orderBy("shard_id")
}
