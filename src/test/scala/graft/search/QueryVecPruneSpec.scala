package graft
package search

import org.apache.spark.sql.functions._

import graft.operators.{Hnsw, IncrementalIndex => II, Search}

/** The qid-Bloom path prune on the bounded-batch query-vector
  * resolution (r13 verdict item 4): segments whose `_idbloom`
  * excludes every batch qid never enter the multi-path scan's path
  * list. Sound by the Bloom no-false-negative contract — pinned here
  * by bit-equality against the un-pruned resolution, plus a gauge
  * that the prune actually drops segments for a localized batch. */
class QueryVecPruneSpec extends SparkSpec {

  private def freshWork(): String = {
    val work = java.nio.file.Files
      .createTempDirectory("graft_qvprune_spec").toString
    val stats = Search.embNormed(spark, sfDir)
      .agg(count(lit(1)), first(size(col("embedding")))).head
    // a planted 6-segment budget: enough segments for the prune to
    // show, few enough that init stays test-cheap
    val budget = math.max(1L,
      stats.getLong(0) * Hnsw.imageBytesPerVec(stats.getInt(1)) / 6)
    II.initSegments(spark, sfDir, work, budget)
    work
  }

  private def resolved(work: String, qids: Seq[Long]) = {
    import spark.implicits._
    II.queryVecs(spark, II.segs(spark, work), qids.toDF("query_id"))
      .sortBy(_._1).map(t => (t._1, t._2.toSeq, t._3)).toSeq
  }

  test("pruned resolution is bit-equal to the un-pruned scan, prunes " +
      "segments a localized batch provably misses, keeps legacy " +
      "segments without a sidecar, and resolves an all-miss batch " +
      "empty") {
    val work = freshWork()
    val ss = II.segs(spark, work)
    assert(ss.size >= 4, s"planted budget yielded only ${ss.size} segs")
    // residue split: qid q lives in segment (q mod S) only
    val qids = Seq(0L, 1L, 7L)
    spark.conf.set("spark.graft.ann.qvPruneMinSegs", "1")
    try {
      val pruned = resolved(work, qids)
      val kept = II.pruneSegsByIdBloom(spark, ss, qids.toArray)
      assert(kept.size < ss.size,
        s"a ${qids.size}-qid batch over ${ss.size} residue segments " +
          "must prune (Bloom fp ~4e-4)")
      // every residue home of a batch qid must be kept
      val homes = qids.map(q => (q % ss.size).toInt).toSet
      assert(homes.subsetOf(kept.map(_.ord).toSet),
        "the prune dropped a segment that HOLDS a batch qid")
      // bit-equality vs the un-pruned arm
      spark.conf.set("spark.graft.ann.qvPruneMinSegs",
        (ss.size + 1).toString)
      val full = resolved(work, qids)
      assert(pruned === full,
        "pruned resolution diverged from the un-pruned scan")
      spark.conf.set("spark.graft.ann.qvPruneMinSegs", "1")
      // a batch of ids NO segment holds resolves empty (and prunes
      // everything — the scan never launches)
      val missQids = Seq(900000001L, 900000002L)
      assert(II.pruneSegsByIdBloom(spark, ss, missQids.toArray).isEmpty,
        "an all-miss batch must prune every sidecar-bearing segment")
      assert(resolved(work, missQids).isEmpty)
      // a legacy segment (sidecar deleted) is ALWAYS kept
      val f = new org.apache.hadoop.fs.Path(work)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.delete(new org.apache.hadoop.fs.Path(
        s"${ss.head.dir}/_idbloom"), true)
      val keptLegacy = II.pruneSegsByIdBloom(spark,
        II.segs(spark, work), missQids.toArray)
      assert(keptLegacy.map(_.ord) === Seq(ss.head.ord),
        "a sidecar-less legacy segment must survive every prune")
    } finally spark.conf.unset("spark.graft.ann.qvPruneMinSegs")
  }
}
