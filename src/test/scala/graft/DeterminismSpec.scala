package graft

import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.functions.VectorFunctions._

/** Partition-invariance: the engine's determinism claims hinge on
  * results not depending on physical partitioning (SURVEY.md §5 —
  * the reference's single-thread stability translated to "stable
  * under any partitioning"). */
class DeterminismSpec extends SparkSpec {

  test("EVERY registered query is invariant to the shuffle-partition count") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def runAll(): Map[String, Seq[String]] = {
      Cache.clear(spark)
      spark.sharedState.cacheManager.clearCache()
      // a bounded pool, like the bench's cold pass: the conf under
      // test is FIXED for the whole pass, each query's row set is
      // collected and sorted independently, and every shared-artifact
      // cache is concurrency-safe (the r13 Cache.getOrBuild leaf-lock
      // fix) — so concurrent execution cannot change any answer, it
      // only overlaps the ~194 small jobs' scheduler latency (this
      // one test dominated the suite wall; round-14 item 1)
      graft.model.Pools.mapConcurrent(
        SparkEntry.queries.toSeq.sortBy(_._1), 8) { case (n, fn) =>
        n -> fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
      }.toMap
    }
    try {
      spark.conf.set(key, "4")
      val a = runAll()
      spark.conf.set(key, "7")
      val b = runAll()
      val diff = a.keys.filter(k => a(k) != b(k)).toSeq.sorted
      assert(diff.isEmpty, s"partitioning-dependent queries: $diff")
    } finally spark.conf.set(key, prev)
  }

  test("sparse vectors identical under adversarial repartitioning") {
    val docs = Tables.documents(spark, sfDir)
    val a = Embedder.sparseVectors(docs, "doc_id", "text")
    val b = Embedder.sparseVectors(docs.repartition(13), "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("integer-cents aggregation identical under repartitioning") {
    val li = Tables.lineitem(spark, sfDir)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("c", round(col("l_extendedprice") * 100, 0).cast("long"))
        .groupBy("l_returnflag")
        .agg((sum(col("c")) / 100.0).as("s"))
    val a = agg(li).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = agg(li.repartition(17)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a === b) // bit-exact, not approximately equal
  }

  test("native dot product identical under repartitioning") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.crossJoin(broadcast(q))
        .select(col("vec_id"), dot(col("embedding"), col("qv")).as("s"))
    val a = scores(e).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = scores(e.repartition(11)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }
}
