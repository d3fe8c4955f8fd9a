package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open session accumulator for [[StreamingOps.sessionizeStream]]
  * (top-level: the state encoder needs a public constructor). */
case class SessionState(n: Long, startMs: Long, endMs: Long)

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

  /** STREAM-STREAM INTERVAL JOIN — the streaming twin of the batch
    * banded range join (`Events.qRangeJoin`): every purchase matched
    * to the clicks within ±`bandMs`. Spark REFUSES a stream-stream
    * join without an equality predicate (state would be unkeyable),
    * and the batch rewrite supplies exactly the missing key: quantize
    * event time into band-width buckets, replicate the click side
    * into its 3 adjacent buckets, and join on BUCKET EQUALITY plus
    * the residual time-range condition — the same ×3 trick, now
    * load-bearing rather than an optimization. Watermarks on both
    * sides plus the range condition bound the state store (≤
    * delay+band × arrival rate per side). Emits matched PAIRS in
    * append mode (a post-join per-purchase aggregate would hold
    * results open until watermark close; the pair stream is the
    * composable shape — StreamingRangeJoinSpec reconciles it against
    * the batch aggregate under uneven interleaved arrival). */
  def rangeJoinStream(purchases: DataFrame, clicks: DataFrame,
      bandMs: Long = 30L * 60 * 1000,
      delay: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
      .withColumn("bucket", expr(s"unix_millis(p_ts) div $bandMs"))
    val c = clicks
      .select(col("event_id").as("c_id"), col("ts").as("c_ts"),
        cents(col("value")).as("c_cents"))
      .withWatermark("c_ts", delay)
      .withColumn("b0", expr(s"unix_millis(c_ts) div $bandMs"))
      .select(col("c_id"), col("c_ts"), col("c_cents"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1))
          .as("bucket"))
    p.join(c,
      p("bucket") === c("bucket") &&
        expr(s"c_ts BETWEEN p_ts - INTERVAL $bandMs MILLISECOND " +
          s"AND p_ts + INTERVAL $bandMs MILLISECOND"))
      .drop("bucket")
  }

  /** Running per-user totals persisted in the state store. */
  case class UserTotals(user_id: Long, n: Long, sum_cents: Long)

  /** Custom keyed state via `mapGroupsWithState`: per-user running
    * (count, exact-cents sum) that survives across micro-batches —
    * the arbitrary-state API the built-in windowed aggregates can't
    * express (e.g. monotone counters, ML feature accumulators). State
    * per key is O(1); at scale eviction is by timeout (kept NoTimeout
    * here so results are deterministic under test). */
  def runningUserTotals(events: Dataset[(Long, Double)]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], st: GroupState[(Long, Long)]) =>
          val (n0, s0) = st.getOption.getOrElse((0L, 0L))
          var n = n0
          var s = s0
          rows.foreach { case (_, v) =>
            n += 1
            s += math.round(v * 100)
          }
          st.update((n, s))
          UserTotals(user, n, s)
      }
  }

  /** Update-mode sink helper for [[runningUserTotals]]. */
  val RunningOutputMode: OutputMode = OutputMode.Update()

  case class SessionOut(user_id: Long, n_events: Long,
      start_ms: Long, end_ms: Long)

  /** Streaming session windows via `flatMapGroupsWithState` +
    * event-time timeout: a session closes (and emits) when the
    * watermark passes its last event + `gapMs`. This is the stateful
    * shape the built-in `window()` cannot express — variable-length
    * sessions keyed by user — and the streaming twin of the batch
    * `q_sessionize`. State per key is one (n, start, end) triple;
    * the watermark bounds its lifetime. */
  def sessionizeStream(events: Dataset[(Long, java.sql.Timestamp)],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            st: GroupState[SessionState]) =>
          if (st.hasTimedOut) {
            // watermark passed last event + gap → close and emit
            val s = st.get
            st.remove()
            Iterator(SessionOut(user, s.n, s.startMs, s.endMs))
          } else {
            val times = rows.map(_._2.getTime).toSeq.sorted
            val closed = Seq.newBuilder[SessionOut]
            var cur = st.getOption
            for (t <- times) cur match {
              case Some(s) if t - s.endMs <= gapMs =>
                cur = Some(s.copy(n = s.n + 1, endMs = t))
              case Some(s) =>
                closed += SessionOut(user, s.n, s.startMs, s.endMs)
                cur = Some(SessionState(1L, t, t))
              case None =>
                cur = Some(SessionState(1L, t, t))
            }
            cur.foreach { s =>
              st.update(s)
              st.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
