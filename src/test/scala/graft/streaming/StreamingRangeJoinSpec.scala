package graft
package streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Events, Relational}

/** Stream-stream interval join vs the batch banded range join: the
  * streamed matched pairs, aggregated per purchase, must reproduce the
  * batch q_range_join counts exactly — under uneven, interleaved
  * micro-batch arrival on both sides. */
class StreamingRangeJoinSpec extends SparkSpec {

  test("streamed interval-join pairs reconcile with the batch " +
      "range-join aggregate") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    assert(purchases.nonEmpty && clicks.nonEmpty)

    val ps = MemoryStream[(Long, Timestamp)]
    val cs = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingOps.rangeJoinStream(
      ps.toDS().toDF("event_id", "ts"),
      cs.toDS().toDF("event_id", "ts", "value"))
    val q = joined.writeStream.format("memory").queryName("range_pairs")
      .outputMode("append").start()
    try {
      // uneven interleaved arrival: clicks in 3 chunks, purchases in 4
      val cChunks = clicks.grouped(math.max(1, clicks.length / 3)).toSeq
      val pChunks = purchases.grouped(math.max(1, purchases.length / 4)).toSeq
      val n = math.max(cChunks.length, pChunks.length)
      for (i <- 0 until n) {
        if (i < cChunks.length) cs.addData(cChunks(i))
        if (i < pChunks.length) ps.addData(pChunks(i))
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("range_pairs")
      .groupBy(col("p_id").as("event_id"))
      .agg(count(lit(1)).as("n_clicks"), sum("c_cents").as("click_cents"))
    // batch truth: q_range_join keeps zero-match purchases; the inner
    // pair stream cannot emit them — compare the matched subset, and
    // separately check the streamed join invents no extra purchases
    val batch = Events.qRangeJoin(spark, sfDir)
    val mismatch = batch.filter(col("n_clicks") > 0)
      .join(streamed, Seq("event_id"), "left")
      .filter(streamed("n_clicks").isNull ||
        batch("n_clicks") =!= streamed("n_clicks") ||
        batch("click_cents") =!= streamed("click_cents"))
    assert(mismatch.count() === 0)
    assert(streamed.join(batch.filter(col("n_clicks") === 0),
      Seq("event_id")).count() === 0)
    // every streamed pair really is in band
    assert(spark.table("range_pairs")
      .filter(abs(unix_millis(col("c_ts")) - unix_millis(col("p_ts"))) >
        30L * 60 * 1000).count() === 0)
  }
}
