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

  test("a delta that CORRECTS a sealed vec_id survives the reseal — " +
      "the grown corpus carries exactly the corrected embedding, " +
      "never both") {
    val spark2 = spark
    import spark2.implicits._

    val sealedDir = Hnsw.sealedDirFor(spark, sfDir)
    val sealed0 = graft.Tables.embeddings(spark, sealedDir)
      .select("vec_id", "embedding")
    val sealedN = sealed0.count()
    val victim = sealed0.orderBy("vec_id").head
    val victimId = victim.getLong(0)
    val corrected = victim.getSeq[Float](1).toArray.map(v => -v)

    // Land the correction as a delta batch directly (the ingest
    // discipline is pinned above; this case is about maybeReseal).
    val work = java.nio.file.Files
      .createTempDirectory("graft_stream_shard_correct").toString
    Seq((victimId, corrected)).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$work/delta/batch=0")

    // Force the trigger with a 1-row delta: fraction > sealedN.
    val (grown, s) = StreamingShardedServe.maybeReseal(spark, sealedDir,
      work, fraction = sealedN + 1).get
    val grownRows = spark.read.parquet(s"$grown/embeddings.parquet")
    assert(grownRows.count() === sealedN,
      "reseal of a pure-correction delta must not change the corpus size")
    val got = grownRows.filter(col("vec_id") === victimId).collect()
    assert(got.length === 1,
      s"grown corpus carries ${got.length} rows for the corrected id — " +
        "the sealed embedding must be anti-joined out, not kept alongside")
    assert(got.head.getSeq[Float](1).toArray.toSeq === corrected.toSeq,
      "reseal reverted the correction to the sealed embedding")

    // Serve-level: the grown corpus must answer exactly like a
    // from-scratch corpus built over (sealed ∖ victim) ∪ correction.
    val refDir = java.nio.file.Files
      .createTempDirectory("graft_stream_shard_correct_ref").toString
    sealed0.filter(col("vec_id") =!= victimId)
      .unionByName(Seq((victimId, corrected)).toDF("vec_id", "embedding"))
      .write.mode("overwrite").parquet(s"$refDir/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val queries = spark.range(8).toDF("query_id")
    assert(rows(Hnsw.serveShardedDistributed(spark, grown, queries,
        shards = s max 2)) ===
      rows(Hnsw.serveShardedDistributed(spark, refDir, queries,
        shards = s max 2)),
      "post-reseal serve over the corrected corpus diverged from the " +
        "from-scratch corrected corpus")
  }
}
