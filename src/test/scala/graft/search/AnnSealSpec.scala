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

  test("tombstone lifecycle: live serve excludes deletes exactly " +
      "(anti-join before top-k), reseal applies them physically and " +
      "truncates the table") {
    val idx = tmp()
    Ann.buildSealedIndex(spark, sfDir, idx)
    // absent-safe: no tombstone table ⇒ live serve == plain serve
    val plain = Ann.probeIvfDelta(spark, sfDir, idx)
    val liveEmpty = Ann.probeIvfDeltaLive(spark, sfDir, idx)
    assert(liveEmpty.exceptAll(plain).isEmpty &&
      plain.exceptAll(liveEmpty).isEmpty)
    // delete 3 ids that are IN the current top-10 — the sharp case
    val dead = plain.select("vec_id").collect().map(_.getLong(0)).take(3).toSeq
    val spark2 = spark
    import spark2.implicits._
    Ann.writeTombstones(spark, dead.toDF("vec_id"), idx)
    val live = Ann.probeIvfDeltaLive(spark, sfDir, idx)
    assert(live.filter(col("vec_id").isin(dead: _*)).count() === 0)
    assert(live.count() === 10, "deletes must not underfill the top-k")
    // exactness: equals the untombstoned serve over-fetched, filtered,
    // re-ranked — tombstoning commutes with ranking
    val expect = Ann.probeIvfDelta(spark, sfDir, idx, k = 10 + dead.size)
      .filter(!col("vec_id").isin(dead: _*))
      .orderBy(desc("score"), col("vec_id")).limit(10)
    assert(live.exceptAll(expect).isEmpty && expect.exceptAll(live).isEmpty)
    // compaction drops exactly the tombstoned rows from the INDEX
    Ann.resealWithTombstones(spark, sfDir, idx)
    val after = store.ChunkStore.read(spark, s"$idx/ivf")
    assert(after.filter(col("vec_id").isin(dead: _*)).count() === 0)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(after.count() === n - dead.size)
    // the tombstone table MUST survive the reseal: the deleted rows
    // still exist in storage, so without it the delta classifier
    // (index-absence = "new arrival") resurrects them — the plain
    // probe demonstrates the hazard, the live probe stays clean
    val p2 = Ann.probeIvfDelta(spark, sfDir, idx)
    assert(p2.filter(col("vec_id").isin(dead: _*)).count() === dead.size,
      "expected the tombstone-blind probe to resurrect storage-resident deletes")
    val l2 = Ann.probeIvfDeltaLive(spark, sfDir, idx)
    assert(l2.filter(col("vec_id").isin(dead: _*)).count() === 0)
    // tombstoning still commutes with ranking on the NEW index (the
    // candidate universe itself may shift at the seal — the documented
    // freshness trade — so compare against the post-seal plain serve,
    // over-fetched, filtered, re-ranked)
    val expect2 = Ann.probeIvfDelta(spark, sfDir, idx, k = 10 + dead.size)
      .filter(!col("vec_id").isin(dead: _*))
      .orderBy(desc("score"), col("vec_id")).limit(10)
    assert(l2.exceptAll(expect2).isEmpty && expect2.exceptAll(l2).isEmpty)
    // explicit truncation (the post-storage-delete step) empties the table
    Ann.truncateTombstones(spark, idx)
    assert(store.ChunkStore.read(spark, s"$idx/tombstones").count() === 0)
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
