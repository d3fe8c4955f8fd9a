package graft
package search

import org.apache.spark.sql.functions._

import graft.operators.Hnsw

/** The distributed HNSW serve ([[Hnsw.serveDistributed]]): a broadcast
  * index image + `mapPartitions` over the query table — the replicated-
  * index throughput path. The load-bearing claim is EQUALITY: the
  * executor-side pure-local serve must answer bit-identically to the
  * driver-side [[Hnsw.Searcher]] (whose layer-0 beam runs through
  * Spark's codegen'd dot product), or the two paths would drift apart
  * silently as either evolves.
  */
class HnswDistSpec extends SparkSpec {

  private val bigDir = "/root/testdata/sf0.01"

  test("distributed serve equals the driver-side searcher, query by " +
      "query, including scores") {
    val dist = Hnsw.qHnswServeDist(spark, bigDir).collect()
      .groupBy(_.getLong(0))
    assert(dist.keySet === (0L until 16L).toSet)
    dist.values.foreach(rs => assert(rs.length === 5))
    val idxPath = java.nio.file.Files
      .createTempDirectory("hnsw_idxd").toString
    val idx = Hnsw.buildIndex(spark, bigDir, idxPath)
    val s = new Hnsw.Searcher(spark, bigDir, idx)
    try (0L until 16L).foreach { qid =>
      val driver = s.serve(qid, ef = 16, k = 5)
      val exec = dist(qid).sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(exec === driver,
        s"query $qid: distributed serve diverged from the driver path")
    } finally s.close()
  }

  test("the query table is actually served in parallel partitions " +
      "(mapPartitions, not a driver loop)") {
    val qs = spark.range(16).toDF("query_id").repartition(4)
    assert(qs.rdd.getNumPartitions === 4)
    // and a query id with no vector yields no rows instead of failing
    val ghost = Hnsw.serveDistributed(spark, bigDir,
      Hnsw.indexFor(spark, bigDir),
      spark.range(999900, 999902).toDF("query_id"), ef = 16, k = 5)
      .collect()
    assert(ghost.isEmpty,
      "queries without a corpus vector must serve empty, not crash")
  }
}
