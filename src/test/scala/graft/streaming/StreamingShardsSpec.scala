package graft
package streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Streaming shard router: stateless placement must agree with the
  * batch layout doc-for-doc, and the running manifest must converge
  * to the batch manifest whatever the micro-batch arrival order. */
class StreamingShardsSpec extends SparkSpec {

  test("streamed manifest equals the batch twin; placement is the " +
      "stable hash bucket") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    val stream = MemoryStream[(Long, Long, String)]
    val q = StreamingShards.manifestStream(stream.toDS())
      .writeStream.format("memory").queryName("shard_manifest")
      .outputMode("complete").start()
    try {
      // reversed, uneven batches — arrival order must not matter
      docs.reverse.grouped(math.max(1, docs.length / 7)).foreach { g =>
        stream.addData(g.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("shard_manifest")
      .orderBy("shard_id").collect()
    val batch = StreamingShards.manifestBatch(
      Tables.documents(spark, sfDir)).collect()
    assert(streamed.nonEmpty)
    assert(streamed.length <= Curation.StableShards)
    assert(streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq ===
      batch.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)
    // placement agrees with the batch churn report's shard domain
    assert(streamed.forall(r =>
      r.getLong(0) >= 0 && r.getLong(0) < Curation.StableShards))
  }
}
