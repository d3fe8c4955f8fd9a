package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Hnsw, Search}

/** Streaming ingest → PARTITIONED-index serving → derived reseal: the
  * last lifecycle seam, composed end-to-end. The pieces all exist on
  * their own — [[StreamingDeltaIngest]] proves the idempotent
  * batch-directory ingest discipline, [[Hnsw.serveShardedDelta]] the
  * two-arm sharded serve, [[Hnsw.resealSharded]] the budget-derived
  * re-segmentation — this object chains them into the loop a live
  * 100 TB retrieval deployment actually runs:
  *
  *   vectors stream in → land in per-batch delta directories
  *     → queries serve sealed-segments + exact-delta (one k-bounded
  *       gather, [[Hnsw.serveShardedIngestDelta]])
  *     → when the delta outgrows a DERIVED fraction of the sealed
  *       corpus, the delta folds in and the corpus reseals at the S
  *       the budget math derives for the GROWN corpus — more
  *       segments, never a bigger per-node image.
  *
  * Scale shape: ingest cost is per-batch file writes (no index
  * mutation — HNSW has no cheap distributed insert, the family rule);
  * serve cost is the sharded scatter-gather plus an
  * ingest-rate-bounded exact scan; the reseal is the amortized
  * rebuild every graph store pays, triggered by measured growth, not
  * a timer. StreamingShardedServeSpec pins the streamed serve
  * batch-equal to the id-cutoff [[Hnsw.serveShardedDelta]] and the
  * post-reseal serve equal to the from-scratch sharded serve over the
  * grown corpus.
  */
object StreamingShardedServe {

  /** Ingest a stream of `(vec_id, embedding)` rows into per-batch
    * delta directories under `$work/delta` — batchId-keyed OVERWRITE,
    * so foreachBatch's at-least-once contract stays idempotent (the
    * [[StreamingDeltaIngest.start]] discipline: a retried micro-batch
    * rewrites its own directory, never appends duplicates). */
  def startIngest(spark: SparkSession, vectors: DataFrame, work: String,
      checkpoint: String): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select("vec_id", "embedding")
          .write.mode("overwrite").parquet(s"$work/delta/batch=$batchId")
      }
      .start()

  /** The streamed delta, tolerant of the fresh state (no committed
    * micro-batch yet = sealed-only serving, not an error). A vector
    * RE-DELIVERED in a later micro-batch (a correction; per-batch
    * overwrite only dedups same-batch retries) resolves
    * latest-batch-wins, so the delta holds one row per vec_id and the
    * serve can never rank one id twice. */
  def deltaRows(spark: SparkSession, work: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$work/delta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an existing-but-batchless delta root is the fresh state too —
    // the incremental seal CONSUMES batch dirs, leaving the root
    // behind, and a schema-less parquet read would throw
    val hasBatches = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
    if (hasBatches) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("batch").desc)
      spark.read.option("basePath", s"$work/delta")
        .parquet(s"$work/delta")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select("vec_id", "embedding")
    } else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("embedding",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
  }

  /** Serve queries (sealed-corpus ids) through the sealed segments +
    * the streamed delta — [[Hnsw.serveShardedIngestDelta]] over
    * whatever has landed in `$work/delta` so far. */
  def serve(spark: SparkSession, sealedDir: String, work: String,
      queries: DataFrame, shards: Int, ef: Int = 16, k: Int = 10,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): DataFrame =
    Hnsw.serveShardedIngestDelta(spark, sealedDir,
      deltaRows(spark, work), queries, shards, ef, k, budgetBytes)

  /** Fold the streamed delta into the corpus and reseal IF the delta
    * has outgrown `1/fraction` of the sealed corpus (growth measured,
    * never assumed — the amortization rule every sealed+delta
    * lifecycle here uses; 4 = reseal past 25% growth). Returns the
    * grown corpus dir and its budget-derived segment count, or None
    * while the delta is still cheap to scan exactly. The new corpus
    * lands in a fresh directory (write-new + swap — the
    * [[graft.model.Artifacts]] discipline); the caller drops the
    * delta directory with the old handle.
    *
    * A delta row may CORRECT a sealed vec_id (re-delivered embedding);
    * the serve path resolves those latest-wins
    * ([[Hnsw.serveShardedIngestDelta]]'s left_anti rule), so the
    * reseal must too — sealed rows shadowed by the delta are
    * anti-joined out before the union, else the grown corpus would
    * carry BOTH embeddings for that id and post-reseal answers could
    * silently revert the correction. */
  def maybeReseal(spark: SparkSession, sealedDir: String, work: String,
      budgetBytes: Long = Hnsw.DefaultNodeBudget,
      fraction: Long = 4L): Option[(String, Int)] = {
    val delta = deltaRows(spark, work)
    val deltaN = delta.count()
    val sealedN = Search.embNormed(spark, sealedDir).count()
    if (deltaN * fraction <= sealedN) None
    else {
      val grown = java.nio.file.Files
        .createTempDirectory("graft_sharded_reseal").toString
      graft.Tables.embeddings(spark, sealedDir)
        .select("vec_id", "embedding")
        .join(delta.select("vec_id"), Seq("vec_id"), "left_anti")
        .unionByName(delta.select("vec_id", "embedding"))
        .write.mode("overwrite").parquet(s"$grown/embeddings.parquet")
      val (s, _) = Hnsw.resealSharded(spark, grown, budgetBytes)
      Some((grown, s))
    }
  }
}
