package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.operators.Dedup

/** One surviving-segment claim per (doc, first-in-doc segment) — the
  * streaming-encoder row of [[StreamingLineDedup]]. */
case class SegClaim(doc_id: Long, ts: Timestamp, pos: Int, g: Long, seg: String)

/** Streaming twin of `Dedup.qLineDedup` — C4-style segment-level exact
  * dedup over a document STREAM: each arriving doc claims its
  * non-overlapping [[Dedup.SegLen]]-token segments;
  * `dropDuplicatesWithinWatermark(g)` keeps the FIRST claimant of each
  * segment hash, so a segment that fails its claim already streamed by
  * in an earlier doc — first-occurrence-wins, the batch rule, with
  * state bounded by arrival rate × watermark delay (the dedup horizon,
  * exactly [[StreamingDedup]]'s trade).
  *
  * Within-doc repeats are collapsed ROW-LOCALLY before claiming
  * ([[firstOccurrence]] — a pure function, no shuffle), so claim
  * outcomes are deterministic even when a doc's segments share one
  * micro-batch. Reassembly ([[rebuiltFromClaims]]) is a sink-side
  * groupBy over the claims table, like `novelFromClaims`.
  */
object StreamingLineDedup {

  /** Non-overlapping SegLen-token segments, batch-identical: same
    * tokenizer, same grouping, position-indexed. */
  def segmentsOf(text: String): Seq[(Int, String)] = {
    val t = Embedder.tokenize(text)
    if (t.isEmpty) Seq.empty
    else t.grouped(Dedup.SegLen).zipWithIndex
      .map { case (w, i) => (i, w.mkString(" ")) }.toSeq
  }

  /** Keep only the doc's first occurrence of each segment (min pos) —
    * makes the per-doc claim set deterministic regardless of
    * micro-batch row order, and matches the batch rule (the global
    * min (doc_id, pos) within the winning doc IS its min pos). */
  def firstOccurrence(segs: Seq[(Int, String)]): Seq[(Int, String)] =
    segs.groupBy(_._2).valuesIterator.map(_.minBy(_._1)).toSeq.sortBy(_._1)

  /** doc stream (id, event-time, text) → surviving segment claims. */
  def segClaims(docs: Dataset[(Long, Timestamp, String)],
      delay: String = "1 hour"): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (id, ts, text) =>
      firstOccurrence(segmentsOf(text)).map { case (pos, seg) =>
        SegClaim(id, ts, pos, Embedder.hash60(seg), seg)
      }
    }.toDF()
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("g")
  }

  /** Sink-side reassembly over the claims table: each doc re-emitted
    * as its surviving segments in position order — the streaming
    * equivalent of q_line_dedup's (n_kept, dedup_text) columns. */
  def rebuiltFromClaims(claims: DataFrame): DataFrame =
    claims.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg"))).as("dedup_text"))
      .orderBy("doc_id")
}
