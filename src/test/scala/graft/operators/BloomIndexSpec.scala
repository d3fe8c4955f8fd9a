package graft
package operators

import org.apache.spark.sql.functions._

/** Per-shard Bloom index ([[Curation.qBloomIndex]]): the filter must
  * never false-negative its own keys, absent probes must skip almost
  * every shard at the measured fpp, and the audit arithmetic must be
  * exact.
  */
class BloomIndexSpec extends SparkSpec {

  test("bloom index: audit shape and exact fpp arithmetic") {
    val rows = Curation.qBloomIndex(spark, sfDir).collect()
    assert(rows.length === Curation.BloomShards)
    rows.foreach { r =>
      val (nk, nb, fpp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nk > 0 && nb > 0 && nb <= Curation.BloomBits)
      // k distinct-ish positions per key, capped by collisions
      assert(nb <= Curation.BloomK * nk)
      val m = Curation.BloomBits
      val expect = (BigInt(nb).pow(4) * 1000000 / BigInt(m).pow(4)).toLong
      assert(fpp === expect)
    }
  }

  test("bloom index: zero false negatives, absent probes skip shards") {
    import spark.implicits._
    import graft.embed.Embedder.hash60
    val truth = Tables.documents(spark, sfDir)
      .select(pmod(col("doc_id"), lit(Curation.BloomShards)).as("shard"),
        graft.embed.Embedder.hash60Col(col("text")).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    // present probes: every key must surface its true shard
    val present = truth.take(80).toSeq
    val cands = Curation.bloomShardCandidates(spark, sfDir,
        present.map(_._1).toDF("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    present.foreach { case (h, shard) =>
      assert(cands.contains((h, shard)), s"false negative for $h")
    }
    // absent probes: at the measured per-shard fpp (~1e-6 at this
    // corpus size) nearly all shards are skipped
    val absent = (0 until 100).map(i => hash60(s"definitely-missing:$i"))
    val hits = Curation.bloomShardCandidates(spark, sfDir,
      absent.toDF("h")).count()
    assert(hits <= 2, s"absent probes hit $hits shard candidates")
  }
}
