package graft
package streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Hnsw, Search}

/** The composed streaming lifecycle on the PARTITIONED regime:
  * ingest micro-batches land in delta directories, serving composes
  * sealed segments with the streamed delta in one k-bounded gather,
  * and the reseal triggers on MEASURED growth. Pins the two
  * equivalences the composition promises: streamed serve ≡ the
  * id-cutoff [[Hnsw.serveShardedDelta]] over the same vectors
  * (arrival order and batching must not matter), and the post-reseal
  * corpus serves exactly like a from-scratch sharded corpus of the
  * same rows. */
class StreamingShardedServeSpec extends SparkSpec {

  test("fresh state (no committed micro-batch yet) serves sealed-only " +
      "— not an error, and exactly the sharded serve of the sealed " +
      "corpus") {
    val sealedDir = Hnsw.sealedDirFor(spark, sfDir)
    val work = java.nio.file.Files
      .createTempDirectory("graft_stream_shard_fresh").toString
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val queries = spark.range(8).toDF("query_id")
    val got = rows(StreamingShardedServe.serve(spark, sealedDir, work,
      queries, shards = 4, ef = 16, k = 5))
    val want = rows(Hnsw.serveShardedDistributed(spark, sealedDir,
      queries, shards = 4, ef = 16, k = 5))
    assert(got === want,
      "fresh-state streamed serve must equal the pure sealed sharded " +
        "serve")
    assert(StreamingShardedServe.maybeReseal(spark, sealedDir, work)
      .isEmpty, "reseal fired with an empty delta")
  }

  test("streamed ingest + sharded serve ≡ the id-cutoff sealed+delta " +
      "serve, across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val e = Search.embNormed(spark, sfDir)
    val cutoff = Ann.deltaCutoff(e).head.getLong(0)
    val sealedDir = Hnsw.sealedDirFor(spark, sfDir)
    val deltaVecs = e.filter(col("vec_id") >= cutoff)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    assert(deltaVecs.nonEmpty, "fixture needs a non-empty delta")

    val work = java.nio.file.Files
      .createTempDirectory("graft_stream_shard").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_shard_ckpt").toString
    val stream = MemoryStream[(Long, Array[Float])]
    val q = StreamingShardedServe.startIngest(spark,
      stream.toDF().toDF("vec_id", "embedding"), work, ckpt)
    try {
      stream.addData(deltaVecs.take(deltaVecs.size / 2): _*)
      q.processAllAvailable()
      stream.addData(deltaVecs.drop(deltaVecs.size / 2): _*)
      q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val queries = spark.range(8).toDF("query_id")
    val got = rows(StreamingShardedServe.serve(spark, sealedDir, work,
      queries, shards = 4, ef = 16, k = 5))
    val want = rows(Hnsw.serveShardedDelta(spark, sfDir, queries,
      shards = 4, ef = 16, k = 5))
    assert(got === want,
      "streamed sealed+delta serve diverged from the id-cutoff serve " +
        "over the same vectors")

    // derived reseal: 10% growth stays below the default 25% trigger
    assert(StreamingShardedServe.maybeReseal(spark, sealedDir, work)
      .isEmpty, "reseal fired below the derived growth fraction")
    // force the trigger; the grown corpus must serve exactly like a
    // from-scratch sharded corpus over the same rows (= the full
    // fixture corpus), at the budget-derived S
    val n = e.count()
    val budget = n * Hnsw.imageBytesPerVec(64) / 4 + 1
    val (grown, s) = StreamingShardedServe.maybeReseal(spark, sealedDir,
      work, budgetBytes = budget, fraction = 20L).get
    assert(s >= 2, s"planted budget failed to force the sharded regime: $s")
    val after = rows(Hnsw.serveShardedDistributed(spark, grown, queries,
      shards = s))
    val scratch = rows(Hnsw.serveShardedDistributed(spark, sfDir, queries,
      shards = s))
    assert(after === scratch,
      "post-reseal serving diverged from a from-scratch sharded corpus")
  }
}
