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
    * append (vec_id, cell) to `indexPath/delta`, partitioned by cell
    * like the sealed index. Serving unions `indexPath/ivf` probe cells
    * with the delta directory; [[graft.operators.Ann.resealIndex]]
    * (or a plain file merge of the two directories) re-seals. */
  def start(spark: SparkSession, dir: String, vectors: DataFrame,
      indexPath: String, checkpoint: String,
      cells: Int = AnnGeometry.Pinned.ivfCells): StreamingQuery = {
    graft.operators.Search.embNormed(spark, dir) // warm the codebook side
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        assignBatch(spark, dir, batch, cells)
          .write.mode("append").partitionBy("cell")
          .parquet(s"$indexPath/delta")
      }
      .start()
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
    val idxSide = graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
      .join(broadcast(probe), "cell")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), lit("indexed").as("segment"))
    val deltaSide = graft.store.ChunkStore.read(spark, s"$indexPath/delta")
      .select(col("vec_id"), lit("delta").as("segment"))
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
    val merged = graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
      .select("vec_id", "cell")
      .unionByName(graft.store.ChunkStore.read(spark, s"$indexPath/delta")
        .select("vec_id", "cell"))
    graft.store.ChunkStore.write(merged, s"$indexPath/ivf_next",
      partitionCols = Seq("cell"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(indexPath).getFileSystem(conf)
    val cur = new org.apache.hadoop.fs.Path(s"$indexPath/ivf")
    fs.delete(cur, true)
    require(
      fs.rename(new org.apache.hadoop.fs.Path(s"$indexPath/ivf_next"), cur),
      s"delta reseal swap failed at $indexPath")
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/delta"), true)
  }
}
