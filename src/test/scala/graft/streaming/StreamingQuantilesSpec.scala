package graft
package streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Streaming bottom-k quantile sample: state stays within the k-pair
  * budget per group across micro-batches, the final streamed sample is
  * bit-identical to the batch sample (merge-order invariance), and the
  * sink-side estimates equal the batch query's est columns row-for-row.
  */
class StreamingQuantilesSpec extends SparkSpec {

  test("streamed sample equals the batch sample; estimates equal the batch query") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = Events.qsProjected(spark, sfDir)
      .as[(String, Long, Long)].collect()

    val stream = MemoryStream[(String, Long, Long)]
    val q = StreamingQuantiles.sampleStream(stream.toDS())
      .writeStream.format("memory").queryName("qs_sample")
      .outputMode("complete").start()
    try {
      // 7 uneven micro-batches — a merge tree no batch run uses
      ev.grouped(math.max(1, ev.length / 7)).foreach { g =>
        stream.addData(g.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("qs_sample")
    // state bound: every group's sample holds at most QsK pairs
    assert(streamed.filter(size(col("mins")) > Events.QsK).count() === 0)

    // the streamed sample IS the batch sample (merge-order invariance)
    val batchSample = ev.groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(r => (r._2, r._3)).sorted.take(Events.QsK).toSeq
    }
    val streamedSample = streamed
      .select(col("event_type"), col("mins")).collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p =>
          (p.getLong(0), p.getLong(1))).toSeq).toMap
    assert(streamedSample.keySet === batchSample.keySet)
    batchSample.foreach { case (t, want) =>
      assert(streamedSample(t) === want, s"sample diverges for $t")
    }

    // sink-side estimates == the batch query's est columns, row-for-row
    val fromStream = StreamingQuantiles.quantilesFromSamples(streamed)
      .orderBy("event_type", "pct").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val batch = Events.qQuantileSketch(spark, sfDir)
      .orderBy("event_type", "pct").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3), r.getDouble(4)))
    assert(fromStream.toSeq === batch.toSeq)
  }
}
