package graft
package streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ANN serving: per-micro-batch probes of the static cached
  * index return exactly what the batch probe returns for the same
  * query vectors (single code path, two execution modes), and results
  * accumulate across batches. */
class StreamingServeSpec extends SparkSpec {

  private def queryVecs(n: Int): Seq[(Long, Array[Float])] =
    Tables.embeddings(spark, sfDir)
      .orderBy("vec_id").limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  test("streamed probes == batch probe, across multiple micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val qs = queryVecs(4)
    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingServe.serve(spark, sfDir,
      stream.toDF().toDF("query_id", "qv"), k = 5) { (scored, _) =>
      scored.write.mode("append").format("noop").save() // force compute
      scored.createOrReplaceTempView("last_batch")
      scored.collect().foreach(Results.add)
    }
    try {
      stream.addData(qs.take(2): _*)
      q.processAllAvailable()
      stream.addData(qs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.createDataFrame(
      spark.sparkContext.parallelize(Results.drain()),
      StreamingServe.probeBatch(spark, sfDir,
        Seq((0L, Array(0f))).toDF("query_id", "qv")).schema)
    val batch = StreamingServe.probeBatch(spark, sfDir,
      qs.toDF("query_id", "qv"), k = 5)
    assert(streamed.count() === 4 * 5)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("graph-indexed streaming serve == one batch distributed serve " +
      "over the same query vectors, across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val qs = queryVecs(4)
    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingServe.serveIndexed(spark, sfDir,
      stream.toDF().toDF("query_id", "qv"), k = 5) { (scored, _) =>
      scored.collect().foreach(Results.add)
    }
    try {
      stream.addData(qs.take(2): _*)
      q.processAllAvailable()
      stream.addData(qs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = Results.drain()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.size === 4 * 5)
    // one code path, two execution modes: the batch distributed serve
    // over the same vectors must produce the same rows
    val idx = graft.operators.Hnsw.indexFor(spark, sfDir)
    val bc = spark.sparkContext.broadcast(
      graft.operators.Hnsw.imageOf(spark, sfDir, idx))
    val batch = graft.operators.Hnsw.serveVecsDistributed(spark, bc,
      qs.toDF("query_id", "qv"), ef = 32, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamed === batch.toSeq,
      "streamed graph serve diverged from the batch distributed serve")
  }

  test("every streamed hit is a true cosine neighbor (≤ exact best)") {
    val spark2 = spark
    import spark2.implicits._
    val qs = queryVecs(1)
    val scored = StreamingServe.probeBatch(spark, sfDir,
      qs.toDF("query_id", "qv"), k = 3)
    // the query IS corpus vector 0 → its own best score is 1.0
    assert(scored.agg(max("score")).head.getDouble(0) <= 1.0 + 1e-9)
    assert(scored.count() === 3)
    // ranks are 1..k in score order
    val rows = scored.orderBy("rank").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.sliding(2).forall(p => p(0).getDouble(3) >= p(1).getDouble(3)))
  }
}

/** Driver-side accumulator for foreachBatch outputs (test only). */
object Results {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
  def add(r: org.apache.spark.sql.Row): Unit = synchronized { buf += r }
  def drain(): Seq[org.apache.spark.sql.Row] = synchronized {
    val out = buf.toList; buf.clear(); out
  }
}
