package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Streaming quality gate — the streaming twin of the batch filter
  * chain's first two verdict families, composed in the order the
  * curation pipeline runs them:
  *
  *  1. Gopher rule battery ([[Quality.gopherFlags]]) — a pure
  *     row-local projection, so it runs on the stream verbatim: the
  *     SAME Catalyst expressions as the batch operator produce the
  *     flags, making batch/stream equivalence structural.
  *  2. MinHash-LSH near-dup claims ([[StreamingDedup.bandClaims]]) —
  *     only Gopher-keepers claim band buckets (a rejected doc must not
  *     shadow a later clean near-duplicate: batch curation also
  *     deduplicates AFTER the quality gate), watermark-bounded state.
  *
  * Streaming append mode cannot chain the per-doc all-bands reduction
  * after the stateful dedup (same barrier as [[StreamingDedup]]), so
  * the gate emits the enriched claims stream; [[gateFromClaims]] is
  * the sink/replay-side reduction to the final per-doc decision table
  * with both family verdicts side by side — the filter-chain shape.
  */
object StreamingQuality {

  /** doc stream (id, event-time, text) → surviving band claims of
    * Gopher-keepers, each claim carrying the doc's gopher verdict
    * columns. Rejected docs emit NO claims (they are decided already
    * and must not consume dedup state). */
  def gatedClaims(docs: Dataset[(Long, Timestamp, String)],
      delay: String = "1 hour"): DataFrame = {
    import docs.sparkSession.implicits._
    val flagged = Quality.gopherFlags(
      docs.toDF("doc_id", "ts", "text"))
    val keepers = flagged.filter(col("keep"))
      .select(col("doc_id"), col("ts"), col("text"))
      .as[(Long, Timestamp, String)]
    StreamingDedup.bandClaims(keepers, delay)
  }

  /** Sink/replay-side reduction: the per-doc decision table over ALL
    * streamed docs — gopher verdict, bands won, and the composite
    * `keep` (gopher ∧ won all 4 bands). `flags` is the row-local
    * gopher table for the same docs (recompute with
    * [[Quality.gopherFlags]] — it is a projection, not state). */
  def gateFromClaims(claims: DataFrame, flags: DataFrame): DataFrame =
    flags
      .join(claims.groupBy("doc_id").agg(count(lit(1)).as("bands_won")),
        Seq("doc_id"), "left")
      .withColumn("bands_won", coalesce(col("bands_won"), lit(0L)))
      .withColumn("gopher_keep", col("keep"))
      .withColumn("keep", col("gopher_keep") && col("bands_won") === 4)
      .select("doc_id", "n_words", "gopher_keep", "bands_won", "keep")
}
