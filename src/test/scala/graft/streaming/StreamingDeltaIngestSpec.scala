package graft
package streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Streaming delta ingest for the IVF index: streamed cell assignment
  * equals the from-scratch ranking, sealed+streamed-delta serving
  * equals the anti-join delta serve, and the file-merge reseal equals
  * the recomputing reseal. */
class StreamingDeltaIngestSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_sdelta").toString

  test("assignBatch equals the from-scratch ivf ranking on any slice") {
    val newVecs = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 7 === 3)
    val streamed = StreamingDeltaIngest.assignBatch(spark, sfDir, newVecs)
    val scratch = Ann.ivfRankedG(spark, sfDir, 8).filter(col("rn") === 1)
      .join(newVecs.select("vec_id"), "vec_id")
      .select("vec_id", "cell")
    assert(streamed.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(streamed).isEmpty)
  }

  test("fresh index: serving with NO delta directory is sealed-only, " +
      "not an error") {
    val idx = tmp()
    Ann.buildSealedIndex(spark, sfDir, idx)
    // no micro-batch has ever committed — $idx/delta does not exist
    val served = StreamingDeltaIngest.probeWithDelta(spark, sfDir, idx)
      .collect()
    assert(served.nonEmpty)
    assert(served.forall(_.getString(1) == "indexed"))
  }

  test("crash overlap: a vector present in BOTH sealed index and " +
      "delta serves once and reseals once") {
    val spark2 = spark
    import spark2.implicits._
    val idx = tmp()
    Ann.buildSealedIndex(spark, sfDir, idx)
    // simulate the crash window after a reseal's swap but before its
    // delta cleanup: the delta still holds rows the index now has
    val sealedRows = store.ChunkStore.read(spark, s"$idx/ivf")
      .select(col("vec_id"), col("cell").cast("long")).limit(5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sealedRows.nonEmpty)
    sealedRows.toDF("vec_id", "cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$idx/delta/batch=0")
    val served = StreamingDeltaIngest.probeWithDelta(spark, sfDir, idx,
      k = 1000).collect()
    val perVec = served.groupBy(_.getLong(0))
    assert(perVec.forall(_._2.length == 1),
      "a vector scored twice across segments")
    assert(served.filter(r =>
      sealedRows.exists(_._1 == r.getLong(0)))
      .forall(_.getString(1) == "indexed"))
    // reseal collapses the overlap instead of duplicating rows
    val before = store.ChunkStore.read(spark, s"$idx/ivf").count()
    StreamingDeltaIngest.resealFromDelta(spark, idx)
    val after = store.ChunkStore.read(spark, s"$idx/ivf")
    assert(after.count() === before)
    assert(after.groupBy("vec_id").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("streamed delta: micro-batched ingest -> serve == anti-join " +
      "delta serve; file-merge reseal == recomputing reseal") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val idx = tmp()
    Ann.buildSealedIndex(spark, sfDir, idx)
    // the delta: exactly the vectors the sealed index is missing
    val sealedIds = store.ChunkStore.read(spark, s"$idx/ivf")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val deltaVecs = Tables.embeddings(spark, sfDir)
      .collect()
      .filter(r => !sealedIds(r.getLong(0)))
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    assert(deltaVecs.nonEmpty)

    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingDeltaIngest.start(spark, sfDir,
      stream.toDF().toDF("vec_id", "embedding"), idx, s"$idx/ckpt")
    try {
      val (b1, b2) = deltaVecs.splitAt(deltaVecs.length / 2)
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // every delta vector landed exactly once, with the builder's cell
    val delta = store.ChunkStore.read(spark, s"$idx/delta")
    assert(delta.count() === deltaVecs.length.toLong)
    assert(delta.groupBy("vec_id").count().filter(col("count") > 1)
      .count() === 0)
    // sealed + streamed delta serves the same rows as the anti-join
    // delta serve (and therefore as the from-scratch qAnnDelta)
    val viaStream = StreamingDeltaIngest.probeWithDelta(spark, sfDir, idx)
    val viaAnti = Ann.probeIvfDelta(spark, sfDir, idx)
    assert(viaStream.exceptAll(viaAnti).isEmpty &&
      viaAnti.exceptAll(viaStream).isEmpty)
    // reseal by pure file merge == reseal by recompute == from scratch
    StreamingDeltaIngest.resealFromDelta(spark, idx)
    val probe = Ann.probeIvfIndex(spark, sfDir, idx)
    val scratch = Ann.qAnnIvf(spark, sfDir)
    assert(probe.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(probe).isEmpty)
    // delta directory is gone after the seal
    assert(!new java.io.File(s"$idx/delta").exists())
  }
}
