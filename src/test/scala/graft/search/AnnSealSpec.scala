package graft
package search

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Sealed+delta lifecycle (r7 verdict item 4): partial index build →
  * delta serve → re-seal compaction → full-index probe, each stage
  * equal to its from-scratch twin. */
class AnnSealSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_seal").toString

  test("probeIvfDelta over the sealed partial index equals the " +
      "from-scratch qAnnDelta") {
    val idx = tmp()
    Ann.buildSealedIndex(spark, sfDir, idx)
    // the partial index covers exactly the sealed segment
    val assign = store.ChunkStore.read(spark, s"$idx/ivf")
    val n = Tables.embeddings(spark, sfDir).count()
    val nSealed = assign.count()
    assert(nSealed < n && nSealed >= n * 8 / 10, s"sealed $nSealed of $n")
    val served = Ann.probeIvfDelta(spark, sfDir, idx)
    val scratch = Ann.qAnnDelta(spark, sfDir)
    assert(served.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(served).isEmpty,
      "sealed+delta serve diverged from the from-scratch twin")
  }

  test("resealIndex assigns the delta and the post-seal probe equals " +
      "the from-scratch qAnnIvf; pre-seal delta serve matches on the " +
      "probe-covered rows") {
    val idx = tmp()
    Ann.buildSealedIndex(spark, sfDir, idx)
    val preSeal = Ann.probeIvfDelta(spark, sfDir, idx)
      .select("vec_id", "score").collect().toSet
    Ann.resealIndex(spark, sfDir, idx)
    // post-seal the index covers the whole corpus, one row per vector
    val assign = store.ChunkStore.read(spark, s"$idx/ivf")
    assert(assign.count() === Tables.embeddings(spark, sfDir).count())
    assert(assign.groupBy("vec_id").count().filter(col("count") > 1)
      .count() === 0)
    // and delta rows got the SAME deterministic assignment the
    // from-scratch ranking computes
    val scratchAssign = Ann.qAnnIvf(spark, sfDir)
    val probe = Ann.probeIvfIndex(spark, sfDir, idx)
    assert(probe.exceptAll(scratchAssign).isEmpty &&
      scratchAssign.exceptAll(probe).isEmpty,
      "post-seal probe diverged from from-scratch qAnnIvf")
    // pre-seal sealed+delta serve and post-seal probe agree wherever
    // both report (a delta vector outside the probe cells is visible
    // pre-seal only — that freshness-vs-scan trade IS the delta
    // pattern, so compare the intersection, not the full sets)
    val postSeal = probe.select("vec_id", "score").collect().toSet
    val common = preSeal.map(r => r.getLong(0)) intersect
      postSeal.map(r => r.getLong(0))
    val preCommon = preSeal.filter(r => common(r.getLong(0)))
    val postCommon = postSeal.filter(r => common(r.getLong(0)))
    assert(preCommon === postCommon, "scores drifted across the seal")
    assert(common.nonEmpty)
  }

  test("reseal is idempotent: a second reseal rewrites nothing new") {
    val idx = tmp()
    Ann.buildSealedIndex(spark, sfDir, idx)
    Ann.resealIndex(spark, sfDir, idx)
    val first = store.ChunkStore.read(spark, s"$idx/ivf")
      .select("vec_id", "cell").collect().toSet
    Ann.resealIndex(spark, sfDir, idx)
    val second = store.ChunkStore.read(spark, s"$idx/ivf")
      .select("vec_id", "cell").collect().toSet
    assert(first === second)
  }
}
