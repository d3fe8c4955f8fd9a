package graft
package streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.toks

/** Streaming MG sketch: state must stay within the counter budget
  * across micro-batches, the final summary must keep the superset
  * guarantee over the full streamed corpus, and the sink-side exact
  * verify must reproduce the batch q_heavy_hitters rows exactly. */
class StreamingHittersSpec extends SparkSpec {

  test("streamed summary: bounded, superset-preserving, and its " +
      "exact verify equals the batch query") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val stream = MemoryStream[String]
    val q = StreamingHitters.summaryStream(stream.toDS())
      .writeStream.format("memory").queryName("hh_summary")
      .outputMode("complete").start()
    try {
      // 5 uneven micro-batches — merge tree differs from any batch run
      docs.grouped(math.max(1, docs.length / 5)).foreach { g =>
        stream.addData(g.flatMap(d =>
          graft.embed.Embedder.tokenize(d._2)).toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val summary = spark.table("hh_summary")
      .select(explode(col("summary")).as("e"))
      .select(col("e._1").as("word"), col("e._2").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(summary.nonEmpty &&
      summary.length <= TextAnalysis.MgCounters)

    val tok = Tables.documents(spark, sfDir)
      .select(explode(toks(col("text"))).as("word"))
    val exact = tok.groupBy("word").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.valuesIterator.sum
    val c = TextAnalysis.MgCounters
    // underestimate-only within the additive bound
    summary.foreach { case (w, est) =>
      assert(est <= exact(w), s"$w overestimated")
      assert(exact(w) - est <= n / (c + 1) + 1, s"$w out of bound")
    }
    // superset of everything above N/(c+1)
    val kept = summary.map(_._1).toSet
    exact.foreach { case (w, f) =>
      if (f > n / (c + 1)) assert(kept.contains(w), s"lost $w (f=$f)")
    }
    // sink-side verify == the batch query, row for row
    val streamed = StreamingHitters
      .hittersFromSummary(summary.toIndexedSeq, tok).collect()
    val batch = TextAnalysis.qHeavyHitters(spark, sfDir).collect()
    assert(streamed.map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2))).toSeq ===
      batch.map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2))).toSeq)
  }
}
