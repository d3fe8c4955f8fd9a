package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.VectorFunctions.l2norm
import graft.operators.{Ann, AnnGeometry}

/** Streaming DELTA ingest for the IVF index — the live half of the
  * sealed+growing-segment lifecycle ([[graft.operators.Ann.qAnnDelta]]
  * serves it, [[graft.operators.Ann.resealIndex]] compacts it): each
  * micro-batch of freshly-embedded vectors is assigned to its coarse
  * cell AT INGEST TIME (one broadcast-codebook map — the same
  * deterministic argmax the index builder uses) and appended,
  * cell-partitioned, to the index's `delta` directory. Because delta
  * rows land WITH their assignment, the nightly re-seal is a pure
  * file merge (no recomputation — Milvus's growing-segment flush), and
  * serving reads sealed probe cells + the bounded delta directory.
  *
  * Scale shape: per batch, work = |batch| × cells broadcast dots —
  * no corpus access at all; the sealed index is never touched by
  * ingest. One code path, two modes: [[assignBatch]] is
  * batch-callable and batch-tested (StreamingDeltaIngestSpec proves
  * the streamed assignment equals the from-scratch ranking).
  */
object StreamingDeltaIngest {

  /** Cell assignment for one batch of (vec_id, embedding) rows against
    * the codebook read from `dir` (the first `cells` corpus vectors —
    * swap in a refined codebook table without changing shape). */
  def assignBatch(spark: SparkSession, dir: String, batch: DataFrame,
      cells: Int = AnnGeometry.Pinned.ivfCells): DataFrame = {
    val cents = graft.operators.Search.embNormed(spark, dir)
      .filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    Ann.cellAssign(
      batch.select(col("vec_id"), col("embedding"))
        .withColumn("nrm", l2norm(col("embedding"))), cents)
  }

  /** Start the delta-ingest stream: per micro-batch, assign cells and
    * write (vec_id, cell) to `indexPath/delta/batch=<id>`. The write
    * is keyed by Spark's batchId and uses OVERWRITE, so foreachBatch's
    * at-least-once contract stays idempotent: a retried micro-batch
    * rewrites its own directory instead of appending duplicate rows
    * (a plain `mode("append")` to a shared directory would double
    * every vector of a batch whose checkpoint commit raced a driver
    * failure). Serving unions `indexPath/ivf` probe cells with the
    * delta directory; [[graft.operators.Ann.resealIndex]] (or
    * [[resealFromDelta]]) re-seals. */
  def start(spark: SparkSession, dir: String, vectors: DataFrame,
      indexPath: String, checkpoint: String,
      cells: Int = AnnGeometry.Pinned.ivfCells): StreamingQuery = {
    graft.operators.Search.embNormed(spark, dir) // warm the codebook side
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        assignBatch(spark, dir, batch, cells)
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$indexPath/delta/batch=$batchId")
      }
      .start()
  }

  /** The streamed delta rows, tolerant of the fresh-index state: a
    * sealed index with NO committed micro-batch yet has no delta
    * directory at all — that is sealed-only serving, not an error. */
  private def deltaRows(spark: SparkSession, indexPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/delta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      graft.store.ChunkStore.read(spark, s"$indexPath/delta")
        .select("vec_id", "cell")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cell",
            org.apache.spark.sql.types.LongType))))
  }

  /** Serve sealed + streamed delta: the sealed side reads only the
    * query's 2 probe cells; the delta side reads the (ingest-bounded)
    * delta directory. Row-compatible with
    * [[graft.operators.Ann.probeIvfDelta]] when the delta directory
    * covers exactly the vectors missing from the sealed index. */
  def probeWithDelta(spark: SparkSession, dir: String, indexPath: String,
      k: Int = 10, cells: Int = AnnGeometry.Pinned.ivfCells): DataFrame = {
    val e = graft.operators.Search.embNormed(spark, dir)
    val c = e.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val probe = q.crossJoin(broadcast(c))
      .withColumn("csim", round(
        graft.functions.VectorFunctions.cosinePrenormed(
          graft.functions.VectorFunctions.dot(col("qv"), col("cv")),
          col("qn"), col("cn")), 6))
      .orderBy(desc("csim"), col("cell")).limit(2)
      .select(col("cell"))
    val assign = graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
    val idxSide = assign
      .join(broadcast(probe), "cell")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), lit("indexed").as("segment"))
    // anti-join: a vector present in BOTH segments (crash between a
    // reseal's swap and its delta cleanup) must not score twice; and
    // the query vector is excluded on this side too
    val deltaSide = deltaRows(spark, indexPath)
      .join(assign.select("vec_id"), Seq("vec_id"), "left_anti")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), lit("delta").as("segment"))
      .distinct()
    idxSide.unionByName(deltaSide)
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score", round(
        graft.functions.VectorFunctions.cosinePrenormed(
          graft.functions.VectorFunctions.dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("segment"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** Re-seal from the streamed delta: the delta rows ALREADY carry
    * their cell assignment, so compaction is a pure partitioned file
    * merge — write-new + atomic swap, then drop the delta directory.
    * No vector is re-scored; determinism is inherited from ingest. */
  def resealFromDelta(spark: SparkSession, indexPath: String): Unit = {
    val sealedIdx = graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
      .select("vec_id", "cell")
    // anti-join + distinct mirror the serve path: rows already sealed
    // (crash after a previous reseal's swap but before its delta
    // cleanup) and same-vector rows across batch directories collapse
    // instead of duplicating inside the new index
    val merged = sealedIdx.unionByName(
      deltaRows(spark, indexPath)
        .join(sealedIdx.select("vec_id"), Seq("vec_id"), "left_anti")
        .distinct())
    graft.store.ChunkStore.write(merged, s"$indexPath/ivf_next",
      partitionCols = Seq("cell"))
    graft.model.Artifacts.swap(spark, s"$indexPath/ivf_next",
      s"$indexPath/ivf")
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/delta"), true)
  }
}
