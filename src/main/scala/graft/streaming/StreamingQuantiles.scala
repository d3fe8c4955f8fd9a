package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.MinKPairAggregator
import graft.operators.Events

/** Streaming quantile sketch — the ingest-side twin of
  * [[Events.qQuantileSketch]]: the bottom-k-by-hash sample runs AS the
  * streaming aggregation state, so per-group state is a fixed ≤k-pair
  * buffer however many events stream past — no value-keyed state
  * store, no watermark needed (the sample bound IS the state bound).
  *
  * Because the k-smallest of a hash multiset is merge-order-invariant
  * (the same property QuantileSketchSpec pins for the batch path), the
  * micro-batch merge tree lands on EXACTLY the sample a batch run over
  * the full archive would draw — so the sink-side estimates are not
  * merely close to the batch query's, they are equal row-for-row
  * (StreamingQuantilesSpec). That makes the stream → batch handoff
  * free: a live pipeline can serve quantiles mid-ingest and the
  * nightly batch audit reproduces them bit-identically.
  */
object StreamingQuantiles {

  /** `(event_type, hash, value-cents)` stream → running bottom-k
    * sample per event_type (one row per group per micro-batch in
    * complete mode; state ≤ k pairs per group). */
  def sampleStream(events: Dataset[(String, Long, Long)],
      k: Int = Events.QsK): DataFrame = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(MinKPairAggregator.minK(k))
      .toDF("event_type", "mins")
  }

  /** Sink-side estimates from the FINAL streamed samples — the shared
    * ceil-rank body, so rows are identical to the batch query's est
    * columns. */
  def quantilesFromSamples(samples: DataFrame): DataFrame =
    Events.qsEstFromSample(
      samples
        .select(col("event_type"), explode(col("mins")).as("e"))
        .select(col("event_type"), col("e._2").as("vc")))
}
