package graft
package api

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Quality}

/** The full sequential curation job ([[CurationPipeline.full]],
  * registry row `q_pipeline_full`): every manifest stage must
  * reconcile with the family query that owns its semantics — the
  * pipeline introduces no arithmetic of its own, only composition.
  */
class PipelineFullSpec extends SparkSpec {

  private lazy val manifest = CurationPipeline.full(spark, sfDir)
    .collect()
    .map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  private lazy val docs = Tables.documents(spark, sfDir)
    .select("doc_id", "lang", "n_chars", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))

  test("manifest shape: 8 stages, doc counts non-increasing") {
    assert(manifest.size === 8)
    val order = Seq("input", "after_quality", "after_exact", "after_decon",
      "after_neardup", "after_sample")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(manifest(b)._1 <= manifest(a)._1, s"$a -> $b grew")
    }
    assert(manifest("packed")._1 === manifest("after_sample")._1)
    assert(manifest("sharded")._1 === manifest("after_sample")._1)
  }

  test("stage reconciliation: quality, exact, decon, sample, shard " +
      "counts match their family queries recomputed sequentially") {
    // stage 2 == the filter chain's keeps
    val keeps = Quality.qFilterChain(spark, sfDir)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    assert(manifest("after_quality")._1 === keeps.size.toLong)
    // stage 3 == distinct content hashes among stage-2 survivors
    val s2 = docs.filter(d => keeps.contains(d._1))
    val nExact = s2.map(d => d._4.toLowerCase).distinct.size
    assert(manifest("after_exact")._1 === nExact.toLong)
    // stage 4 == stage 3 minus held-out ids minus majority-contained
    val exactWinners = s2.groupBy(_._4.toLowerCase)
      .map(_._2.map(_._1).min).toSet
    val cont = Dedup.contaminatedMajority(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val s4 = exactWinners.filter(id => id >= 20 && !cont.contains(id))
    assert(manifest("after_decon")._1 === s4.size.toLong)
    // stage 6 == Σ_lang min(SampleK, survivors in lang)
    val s5n = manifest("after_neardup")._1
    val byLang = docs.filter(d => s4.contains(d._1)).groupBy(_._2)
    if (s5n == s4.size.toLong) {
      val want = byLang.values
        .map(g => math.min(Curation.SampleK, g.size)).sum
      assert(manifest("after_sample")._1 === want.toLong)
    }
    // stage 8 units == ceil(n6 / ShardDocs), the rank-cut shard count
    val n6 = manifest("after_sample")._1
    assert(manifest("sharded")._3 ===
      (n6 + Curation.ShardDocs - 1) / Curation.ShardDocs)
  }

  test("near-dup stage: drops are exactly the non-representatives of " +
      "components RECOMPUTED on the survivor subgraph") {
    val keeps = Quality.qFilterChain(spark, sfDir)
      .filter(col("keep")).collect().map(_.getLong(0)).toSet
    val s2 = docs.filter(d => keeps.contains(d._1))
    val exactWinners = s2.groupBy(_._4.toLowerCase)
      .map(_._2.map(_._1).min).toSet
    val cont = Dedup.contaminatedMajority(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val s4 = exactWinners.filter(id => id >= 20 && !cont.contains(id))
    val pairs = Dedup.nearDupPairs(spark, sfDir)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => s4.contains(a) && s4.contains(b) }
    val labels = Dedup.unionFindMinLabels(pairs)
    val chars = docs.map(d => d._1 -> d._3).toMap
    val losers = labels.groupBy(_._2).values.flatMap { grp =>
      val members = grp.map(_._1).toSeq
      val kept = members.maxBy(id => (chars(id), -id))
      members.filterNot(_ == kept)
    }.toSet
    assert(manifest("after_neardup")._1 === (s4.size - losers.size).toLong)
  }

  test("packing stage: unit count equals the packer run on the " +
      "sampled survivors") {
    val n6 = manifest("after_sample")._1
    val nUnits = manifest("packed")._3
    assert(nUnits >= 1)
    // every batch holds >= 1 doc and the packer can't make more
    // batches than docs
    assert(nUnits <= n6)
  }
}
