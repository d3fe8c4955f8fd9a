package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.embed.Embedder
import graft.operators.Dedup

/** One surviving-segment claim per (doc, first-in-doc segment) — the
  * streaming-encoder row of [[StreamingLineDedup]]. */
case class SegClaim(doc_id: Long, ts: Timestamp, pos: Int, g: Long, seg: String)

/** Streaming twin of `Dedup.qLineDedup` — C4-style segment-level exact
  * dedup over a document STREAM: each arriving doc claims its
  * non-overlapping [[Dedup.SegLen]]-token segments; the first claimant
  * of each segment hash wins, so a segment that fails its claim
  * already streamed by in an earlier doc — first-occurrence-wins, the
  * batch rule, with state bounded by arrival rate × watermark delay
  * (the dedup horizon, exactly [[StreamingDedup]]'s trade).
  *
  * Deterministic at BOTH tie granularities: within-doc repeats are
  * collapsed row-locally before claiming ([[firstOccurrence]] — a
  * pure function, no shuffle), and cross-doc ties inside one
  * micro-batch are resolved by `flatMapGroupsWithState` keeping the
  * min (doc_id, pos) claimant per segment hash — the batch rule's
  * attribution, where `dropDuplicatesWithinWatermark` would keep an
  * arbitrary first-seen row. State is one boolean per live segment
  * hash with an event-time timeout at last-arrival + delay.
  * Reassembly ([[rebuiltFromClaims]]) is a sink-side groupBy over the
  * claims table, like `novelFromClaims`.
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
    val delayMs = delayToMs(delay)
    docs.flatMap { case (id, ts, text) =>
      firstOccurrence(segmentsOf(text)).map { case (pos, seg) =>
        SegClaim(id, ts, pos, Embedder.hash60(seg), seg)
      }
    }
      .withWatermark("ts", delay)
      .groupByKey(_.g)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        claimFirst(delayMs))
      .toDF()
  }

  /** Per segment hash: emit the min (doc_id, pos) claimant of the
    * first micro-batch that sees the hash, then hold a claimed flag
    * until the watermark passes last-arrival + delay. */
  private[streaming] def claimFirst(delayMs: Long)(
      g: Long, rows: Iterator[SegClaim],
      state: GroupState[Boolean]): Iterator[SegClaim] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val batch = rows.toSeq
      val out =
        if (state.exists || batch.isEmpty) Iterator.empty
        else Iterator.single(batch.minBy(r => (r.doc_id, r.pos)))
      if (batch.nonEmpty) {
        state.update(true)
        state.setTimeoutTimestamp(batch.map(_.ts.getTime).max + delayMs)
      }
      out
    }
  }

  /** Parse with Spark's own interval parser so every delay string a
    * watermark accepts (multi-term, 'milliseconds', 'days', …) is
    * accepted here too (ADVICE r7). Month-based delays have no fixed
    * millisecond length and are rejected, as Spark's watermark does. */
  private[streaming] def delayToMs(delay: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0,
      s"month-based delay not supported: $delay")
    iv.days * 86400000L + iv.microseconds / 1000L
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
