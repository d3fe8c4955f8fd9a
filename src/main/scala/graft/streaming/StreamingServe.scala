package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.VectorFunctions.{cosinePrenormed, dot, l2norm}
import graft.operators.Search

/** Streaming vector-search serving — the "Spark builds the index,
  * serving probes it" split (SURVEY.md §4) applied to a live query
  * stream: the corpus index is the session-cached static side
  * ([[Search.embNormed]], built once), and each micro-batch of query
  * vectors probes it with the SAME exact-rescoring batch operator the
  * offline path uses ([[probeBatch]] is the q_knn_batch shape over an
  * arbitrary query set). One code path, two execution modes — the
  * Structured Streaming contract the rest of the engine follows.
  *
  * Scale shape: a micro-batch of queries is tiny next to the corpus →
  * the query side broadcasts and the corpus never shuffles; per-query
  * top-k is a window over the broadcast-join output, partitioned by
  * query. Swap [[probeBatch]]'s scan for the IVF probe
  * (`Ann.probeIvfIndex`) to read only the probed cells at 100 TB.
  */
object StreamingServe {

  /** Exact top-k cosine probe of one query batch (`query_id`, `qv`)
    * against the cached corpus — batch-callable (and batch-tested)
    * on its own. */
  def probeBatch(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val q = queries.select(col("query_id"), col("qv"))
      .withColumn("qn", l2norm(col("qv")))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), col("vec_id"))
    e.crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"),
          col("qn")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
  }

  /** Serve a stream of query vectors: per micro-batch, probe the static
    * index and hand the scored top-k to `sink` (a memory table, a
    * Kafka producer, a parquet append — caller's choice). The index is
    * resolved through the session cache on first use and reused for the
    * life of the stream. */
  def serve(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    Search.embNormed(spark, dir) // warm the static side once, up front
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(probeBatch(spark, dir, batch, k), id)
      }
      .start()
  }

  /** Graph-INDEXED streaming serve — [[serve]]'s throughput twin: the
    * static side is the HNSW index image, broadcast ONCE when the
    * stream starts (not per micro-batch), and each batch of query
    * vectors fans out through the same executor-local descent+beam
    * the offline [[graft.operators.Hnsw.serveDistributed]] path uses.
    * Per-batch cost is queries × (descent + beam) with zero corpus
    * scans — the serving tier a live query stream actually needs at
    * 100 TB, where [[probeBatch]]'s exact full scan per micro-batch
    * would be the bottleneck. Same result shape as [[probeBatch]];
    * StreamingServeSpec pins the streamed rows identical to one
    * batch invocation of the distributed serve over the same
    * queries. */
  def serveIndexed(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, ef: Int = 32)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import graft.operators.Hnsw
    val idx = Hnsw.indexFor(spark, dir)
    val bc = spark.sparkContext.broadcast(Hnsw.imageOf(spark, dir, idx))
    val q = queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Hnsw.serveVecsDistributed(spark, bc, batch, ef, k), id)
      }
      .start()
    // release the stream-lifetime broadcast when the stream ends — a
    // long-lived session starting many streams would otherwise leak
    // one image per stream on both driver and executors
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit =
          if (e.id == q.id) {
            bc.unpersist()
            spark.streams.removeListener(this)
          }
      }
    spark.streams.addListener(listener)
    // a query that died in its first moments posts its terminated
    // event BEFORE the listener registers — catch that race here
    // (unpersist is idempotent, so double-release is harmless)
    if (!q.isActive) {
      bc.unpersist()
      spark.streams.removeListener(listener)
    }
    q
  }
}
