package graft
package streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Structured Streaming twin-check: the same StreamingOps transforms
  * produce identical results in streaming (MemoryStream) and batch
  * mode — the core Structured Streaming contract. */
class StreamingSpec extends SparkSpec {

  private def events: Seq[Ev] = {
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    (0 until 100).map { i =>
      Ev(i.toLong, new Timestamp(base + i * 137000L), s"t${i % 3}",
        (i * 7 % 500) / 100.0 * 100)
    }
  }

  test("windowed counts: streaming complete-mode == batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Ev]
    stream.addData(events: _*)
    val q = StreamingOps.windowedEventCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("win_counts")
    val batch = StreamingOps.windowedEventCounts(events.toDF())
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("mapGroupsWithState: per-user totals survive across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, Double)]
    val q = StreamingOps.runningUserTotals(stream.toDS())
      .writeStream.format("memory").queryName("user_totals")
      .outputMode(StreamingOps.RunningOutputMode).start()
    try {
      stream.addData((1L, 1.25), (1L, 2.00), (2L, 5.50))
      q.processAllAvailable()
      stream.addData((1L, 0.75))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("user_totals")
    // latest emission per user reflects accumulated state
    val u1 = rows.filter("user_id = 1").orderBy(org.apache.spark.sql
      .functions.desc("n")).head
    assert(u1.getLong(1) === 3L && u1.getLong(2) === 400L)
    val u2 = rows.filter("user_id = 2").orderBy(org.apache.spark.sql
      .functions.desc("n")).head
    assert(u2.getLong(1) === 1L && u2.getLong(2) === 550L)
  }

  test("flatMapGroupsWithState: sessions close via event-time timeout") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(minutes: Long) = new Timestamp(t0 + minutes * 60000L)

    val stream = MemoryStream[(Long, Timestamp)]
    val q = StreamingOps.sessionizeStream(stream.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // burst 1: user 1, three events within the gap
      stream.addData((1L, ts(0)), (1L, ts(5)), (1L, ts(10)))
      q.processAllAvailable()
      // much later event advances the watermark far past burst1+gap →
      // burst 1's session times out and emits; this event opens a new one
      stream.addData((1L, ts(300)))
      q.processAllAvailable()
      stream.addData((1L, ts(600)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("sessions").as[StreamingOps.SessionOut].collect()
      .sortBy(_.start_ms)
    assert(out.nonEmpty)
    assert(out.head.n_events === 3L)
    assert(out.head.start_ms === t0 && out.head.end_ms === t0 + 10 * 60000L)
  }

  test("stream dedup drops duplicate event ids within the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dups = events ++ events.take(40) // re-deliver 40
    val stream = MemoryStream[Ev]
    stream.addData(dups: _*)
    val q = StreamingOps.dedupeStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    assert(spark.table("dedup_out").count() === events.size.toLong)
    assert(spark.table("dedup_out").select("event_id").distinct().count()
      === events.size.toLong)
  }
}
