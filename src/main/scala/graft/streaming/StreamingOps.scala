package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming surface of the engine. The reference has no
  * streaming semantics at all (SURVEY.md §2.13 — verified absent), so
  * this is the forward-looking extension: the same declarative
  * transforms run over `readStream` sources with watermarked state.
  *
  * Both functions are written against plain DataFrames so they work
  * identically in batch (parquet scan) and streaming (readStream /
  * MemoryStream) mode — the Structured Streaming contract. State
  * design at scale: tumbling windows + watermark bound state size;
  * dedup keys expire with the watermark, so the state store never
  * grows past `delay × arrival-rate`.
  */
object StreamingOps {

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Watermarked tumbling-window aggregation over the events schema
    * (ts, event_type, value) — the streaming twin of q_time_window. */
  def windowedEventCounts(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermark-bounded stream dedup on event_id (exactly-once shape for
    * at-least-once sources; reference has only batch result dedup J6). */
  def dedupeStream(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicates("event_id", "ts")
}
