package graft
package operators

import org.apache.spark.sql.functions._

/** Semantic invariants of the corpus-curation family (exact values are
  * oracle-checked by the Verify gate; these pin data-independent
  * properties). */
class CurationSpec extends SparkSpec {

  test("data split: partitions the corpus, ~80/10/10, and is stable") {
    val docs = Tables.documents(spark, sfDir).count()
    val split = Curation.qDataSplit(spark, sfDir)
    assert(split.agg(sum("n_docs")).head.getLong(0) === docs)
    val bySplit = split.groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash-uniformity within loose bounds on 500+ docs
    assert(bySplit("train").toDouble / docs > 0.7)
    assert(bySplit("train").toDouble / docs < 0.9)
    // determinism: same membership on recomputation
    val again = Curation.qDataSplit(spark, sfDir)
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("repetition quality: fractions are valid ratios, keep matches thresholds") {
    val q = Curation.qQualityRepetition(spark, sfDir)
    assert(q.filter(col("top_bigram_frac") < 0 || col("top_bigram_frac") > 1 ||
      col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1).count() === 0)
    val wrongFlag = q.filter(col("keep") =!=
      (col("top_bigram_frac") <= 0.18 && col("dup_trigram_frac") <= 0.3)).count()
    assert(wrongFlag === 0)
    // a doc that is one phrase repeated must be flagged as drop: the
    // planted near-dups in the corpus all keep ttr > 0, so assert the
    // relationship on the extreme row instead of synthetic input
    val maxFrac = q.agg(max("dup_trigram_frac")).head.getDouble(0)
    assert(maxFrac >= 0.0 && maxFrac <= 1.0)
  }

  test("pack batches: bins respect shard boundaries and token accounting") {
    val d = Tables.documents(spark, sfDir)
      .select(col("source"), size(TextAnalysis.toks(col("text"))).cast("long").as("tok"))
    val totalTok = d.agg(sum("tok")).head.getLong(0)
    val bins = Curation.qPackBatches(spark, sfDir)
    // every token lands in exactly one bin
    assert(bins.agg(sum("bin_tokens")).head.getLong(0) === totalTok)
    // doc ranges within a shard never overlap: last_doc < next first_doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("bin")
    val overlaps = bins
      .withColumn("next_first", lead(col("first_doc"), 1).over(w))
      .filter(col("next_first").isNotNull && col("last_doc") >= col("next_first"))
      .count()
    assert(overlaps === 0)
    // a bin only opens once the previous bins' capacity is consumed:
    // start offset of bin b is >= b * capacity
    val under = bins
      .withColumn("start_before",
        sum(col("bin_tokens")).over(w) - col("bin_tokens"))
      .filter(col("start_before") < col("bin") * Curation.PackCapacity)
      .count()
    assert(under === 0)
  }

  test("pack batches: two-pass packing == single-window formulation") {
    val fast = Curation.qPackBatches(spark, sfDir)
    val twin = Curation.packBatchesWindowTwin(spark, sfDir)
    assert(fast.exceptAll(twin).isEmpty && twin.exceptAll(fast).isEmpty)
  }

  test("pack under the trained tokenizer == single-window twin over " +
      "the same exact counts") {
    val tokens = Tables.documents(spark, sfDir).select("doc_id", "source")
      .join(Curation.bpeEncode(spark, sfDir,
          Curation.bpeTrain(spark, sfDir, Curation.BpeMerges))
        .select(col("doc_id"), col("n_tokens").as("tok")), "doc_id")
    val fast = Curation.qPackBpe(spark, sfDir)
    val twin = Curation.packWindowTwinFrom(tokens)
    assert(fast.exceptAll(twin).isEmpty && twin.exceptAll(fast).isEmpty)
    // the bin plan genuinely differs from the whitespace estimate's
    assert(fast.exceptAll(Curation.qPackBatches(spark, sfDir))
      .count() > 0)
  }

  test("bm25: positive scores, deterministic top-10, ranks docs containing query terms") {
    val top = Search.qSearchBm25(spark, sfDir)
    val rows = top.collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getDouble(rows.head.fieldIndex("score")) > 0))
    // every returned doc really contains at least one query word
    val ids = rows.map(_.getLong(rows.head.fieldIndex("doc_id"))).toSeq
    val hits = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isin(ids: _*))
      .filter(Search.QueryText.split(" ").map(w => col("text").contains(w))
        .reduce(_ || _))
      .count()
    assert(hits === 10)
  }

  test("grouping sets: subtotal rows reconcile with the detail rows") {
    val gs = Relational.qGroupingSets(spark, sfDir)
    val detailN = gs.filter(col("returnflag") =!= "ALL").agg(sum("n")).head.getLong(0)
    val subtotalN = gs.filter(col("returnflag") === "ALL" &&
      col("linestatus") =!= "ALL").agg(sum("n")).head.getLong(0)
    val grandN = gs.filter(col("returnflag") === "ALL" &&
      col("linestatus") === "ALL").select("n").head.getLong(0)
    assert(detailN === grandN && subtotalN === grandN)
  }

  test("boilerplate: shared fraction is a valid ratio and keep matches it") {
    val q = Curation.qBoilerplate(spark, sfDir).cache()
    assert(q.filter(col("shared_trigrams") > col("n_trigrams")).count() === 0)
    assert(q.filter(col("shared_frac") < 0 || col("shared_frac") > 1)
      .count() === 0)
    assert(q.filter(col("keep") =!= (col("shared_frac") <= 0.5)).count() === 0)
    // every doc with ≥3 tokens appears exactly once
    val eligible = Tables.documents(spark, sfDir)
      .filter(size(TextAnalysis.toks(col("text"))) >= 3).count()
    assert(q.count() === eligible)
    assert(q.select("doc_id").distinct().count() === eligible)
    q.unpersist()
  }

  test("data mix: smallest stratum kept whole, rates valid, deterministic") {
    val q = Curation.qDataMix(spark, sfDir).cache()
    assert(q.filter(col("kept_docs") > col("n_docs")).count() === 0)
    // the smallest language stratum has target_rate 1.0 and keeps all
    // docs (h·c_min < c_min·10⁶ holds for every h < 10⁶)
    val smallest = q.orderBy(col("n_docs"), col("lang")).head
    assert(smallest.getAs[Double]("target_rate") === 1.0)
    assert(smallest.getAs[Long]("kept_docs") === smallest.getAs[Long]("n_docs"))
    // hash thinning tracks the target rate (loose bound, small strata)
    q.collect().foreach { r =>
      val diff = math.abs(r.getAs[Double]("achieved_rate") -
        r.getAs[Double]("target_rate"))
      assert(diff < 0.35, s"lang ${r.getString(0)}: rate off by $diff")
    }
    // determinism under repartitioning: membership is a pure hash
    val again = Curation.qDataMix(spark, sfDir)
    assert(q.exceptAll(again).isEmpty && again.exceptAll(q).isEmpty)
    q.unpersist()
  }

  test("rarity: frequency accounting is conserved and bounded") {
    val q = Curation.qRarity(spark, sfDir).cache()
    // every token occurs at least once, so min_freq ≥ 1 and
    // sum_freq ≥ n_toks ⇒ avg_freq ≥ 1
    assert(q.filter(col("min_freq") < 1).count() === 0)
    assert(q.filter(col("sum_freq") < col("n_toks")).count() === 0)
    assert(q.filter(col("avg_freq") < 1.0).count() === 0)
    // token conservation: Σ n_toks == total corpus tokens
    val total = Tables.documents(spark, sfDir)
      .select(size(TextAnalysis.toks(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(q.agg(sum("n_toks")).head.getLong(0) === total)
    q.unpersist()
  }

  test("stratified sample: exactly min(k, |stratum|) per lang, ranks contiguous") {
    val q = Curation.qSampleStrat(spark, sfDir).cache()
    val perLang = q.groupBy("lang")
      .agg(count(lit(1)).as("n"), max("rk").as("maxrk"), min("rk").as("minrk"))
    val strata = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("total"))
    // n == min(SampleK, stratum size); ranks are 1..n with no gaps
    val bad = perLang.join(strata, "lang")
      .filter(col("n") =!= least(lit(Curation.SampleK.toLong), col("total")) ||
        col("minrk") =!= 1L || col("maxrk") =!= col("n"))
      .count()
    assert(bad === 0)
    // determinism: identical membership on recomputation
    val again = Curation.qSampleStrat(spark, sfDir)
    assert(q.exceptAll(again).isEmpty && again.exceptAll(q).isEmpty)
    q.unpersist()
  }

  test("domain cap: kept_docs = min(cap, n_docs), kept_chars bounded") {
    val q = Curation.qDomainCap(spark, sfDir).cache()
    assert(q.filter(col("kept_docs") =!=
      least(lit(Curation.DomainCap.toLong), col("n_docs"))).count() === 0)
    assert(q.filter(col("kept_chars") > col("total_chars")).count() === 0)
    // the cap keeps the LONGEST docs: an uncapped domain keeps all chars
    assert(q.filter(col("n_docs") <= Curation.DomainCap &&
      col("kept_chars") =!= col("total_chars")).count() === 0)
    // accounting against the raw table
    val raw = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("raw_n"))
    assert(q.join(raw, "source").filter(col("n_docs") =!= col("raw_n"))
      .count() === 0)
    q.unpersist()
  }

  test("bpe pairs: counts match a brute-force recount of the word table") {
    val out = Curation.qBpePairs(spark, sfDir).collect()
    assert(out.length === 20)
    // every pair is exactly two characters and counts are positive
    assert(out.forall(r => r.getString(0).length === 2))
    assert(out.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))
    // ordered by count desc, pair asc
    val keys = out.map(r => (r.getLong(1), r.getString(0)))
    assert(keys.sliding(2).forall { w =>
      w.length < 2 || w(0)._1 > w(1)._1 ||
        (w(0)._1 == w(1)._1 && w(0)._2 < w(1)._2)
    })
    // brute force: recount the top pair from the raw word list
    val (top, topCount) = (out.head.getString(0), out.head.getLong(1))
    val words = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.toks(col("text"))).as("w"))
      .collect().map(_.getString(0))
    val expected = words.map { w =>
      (0 until math.max(w.length - 1, 0))
        .count(i => w.substring(i, i + 2) == top).toLong
    }.sum
    assert(topCount === expected)
  }

  test("seq len hist: truncation forecast is monotone in context length") {
    val docs = Tables.documents(spark, sfDir).count()
    val rows = Curation.qSeqLenHist(spark, sfDir)
      .orderBy("ctx_len").collect()
    assert(rows.length === Curation.CtxLens.length)
    // every row accounts for the whole corpus with one token total
    assert(rows.forall(_.getLong(1) === docs))
    assert(rows.map(_.getLong(3)).distinct.length === 1)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3))          // kept <= total
      assert(r.getLong(5) <= 1000000L)              // frac valid
      assert(r.getLong(2) <= r.getLong(1))          // truncated <= docs
    }
    // longer context: fewer truncations, more tokens kept
    assert(rows.sliding(2).forall { w =>
      w.length < 2 || (w(0).getLong(2) >= w(1).getLong(2) &&
        w(0).getLong(4) <= w(1).getLong(4))
    })
  }

  test("unimax alloc: uniform-first waterfill — caps respected, " +
      "uncapped langs share equally") {
    val p = Curation.qUnimaxAlloc(spark, sfDir).persist()
    // nobody exceeds the 4-epoch cap; alloc never exceeds cap
    assert(p.filter(col("epochs_milli") > 4000).count() === 0)
    assert(p.filter(col("tokens_allocated") > col("cap_tokens"))
      .count() === 0)
    // capped rows get exactly their cap
    assert(p.filter(col("capped") &&
      col("tokens_allocated") =!= col("cap_tokens")).count() === 0)
    // budget is respected and some language is left uncapped (3.5 < 4)
    val agg = p.agg(sum("n_tokens").cast("long"),
      sum("tokens_allocated").cast("long")).head
    assert(agg.getLong(1) <= agg.getLong(0) * 7 / 2)
    assert(p.filter(!col("capped")).count() >= 1)
    // all uncapped languages receive the SAME share (uniformity —
    // the property that distinguishes UniMax from the epoch plan)
    val shares = p.filter(!col("capped"))
      .select("tokens_allocated").collect().map(_.getLong(0)).distinct
    assert(shares.length === 1)
    // the uncapped share is >= every capped language's cap (waterfill:
    // caps below the water level cap, everyone else sits at it)
    val capsBelow = p.filter(col("capped"))
      .select("cap_tokens").collect().map(_.getLong(0))
    assert(capsBelow.forall(_ <= shares.head))
    p.unpersist()
  }

  test("dist drift: shares sum to one within floor rounding, drift " +
      "reconciles, token masses match the release scans") {
    val rows = Curation.qDistDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val langs = rows.length
    // floor-division shares: total in (1e6 - langs, 1e6]
    Seq(3, 4).foreach { i =>
      val s = rows.map(_.getLong(i)).sum
      assert(s > 1000000L - langs && s <= 1000000L, s"share col $i: $s")
    }
    // drift column is exactly the share difference, TVD within [0,1e6]
    rows.foreach(r =>
      assert(r.getLong(5) === r.getLong(4) - r.getLong(3)))
    val tvd = rows.map(r => math.abs(r.getLong(5))).sum / 2
    assert(tvd >= 0 && tvd <= 1000000L)
    // v1 token masses agree with an independent scan
    val v1 = Tables.documents(spark, sfDir)
      .select(col("lang"),
        size(graft.operators.TextAnalysis.toks(col("text")))
          .cast("long").as("t"))
      .groupBy("lang").agg(sum("t").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getLong(1) === v1.getOrElse(r.getString(0), 0L)))
  }

  test("pack shards: bins never cross shards, token accounting " +
      "lossless, equal to the window twin over the routed table") {
    import org.apache.spark.sql.functions._
    val got = Curation.qPackShards(spark, sfDir).collect()
    assert(got.nonEmpty)
    // doc/token accounting is lossless vs the raw corpus
    val docs = Tables.documents(spark, sfDir)
    assert(got.map(_.getLong(2)).sum === docs.count())
    val totTok = docs.agg(sum(size(
      graft.operators.TextAnalysis.toks(col("text")))).cast("long"))
      .head.getLong(0)
    assert(got.map(_.getLong(3)).sum === totTok)
    // the single-window twin over the identically routed table
    val routed = docs.select(col("doc_id"),
      Curation.stableShardCol(col("doc_id")).as("source"),
      size(graft.operators.TextAnalysis.toks(col("text")))
        .cast("long").as("tok"))
    val twin = Curation.packWindowTwinFrom(routed).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq ===
      twin.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq)
  }

  test("shard churn: change accounting reconciles with the corpus " +
      "diff, shard ids cover the stable range") {
    val churn = Curation.qShardChurn(spark, sfDir).collect()
    assert(churn.nonEmpty)
    churn.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < Curation.StableShards)
      val dirty = r.getLong(2) + r.getLong(3) + r.getLong(4) > 0
      assert(r.getBoolean(5) === dirty)
    }
    // totals must equal the release diff's per-class doc counts
    val diff = Curation.qCorpusDiff(spark, sfDir).collect()
      .groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(churn.map(_.getLong(2)).sum === diff.getOrElse("added", 0L))
    assert(churn.map(_.getLong(3)).sum === diff.getOrElse("removed", 0L))
    assert(churn.map(_.getLong(4)).sum === diff.getOrElse("changed", 0L))
    // every doc of the union lands in exactly one shard
    val nUnion = diff.values.sum
    assert(churn.map(_.getLong(1)).sum === nUnion)
  }

  test("epoch plan: caps respected, budget never exceeded, surplus lands") {
    val p = Curation.qEpochPlan(spark, sfDir).persist()
    // nobody exceeds the 4-epoch repetition cap
    assert(p.filter(col("epochs_milli") > 4000).count() === 0)
    // allocation never exceeds the 3.5x budget
    val agg = p.agg(sum("n_tokens").cast("long").as("n"),
      sum("tokens_allocated").cast("long").as("a")).head
    assert(agg.getLong(1) <= agg.getLong(0) * 7 / 2)
    // allocation is positive and no stratum starves
    assert(p.filter(col("tokens_allocated") <= 0).count() === 0)
    // smaller strata get MORE epochs (temperature up-sampling), and
    // the capped set is a prefix of the by-size ordering
    val rows = p.orderBy("n_tokens").collect()
      .map(r => (r.getLong(1), r.getLong(4)))
    assert(rows.sliding(2).forall { w =>
      w.length < 2 || w(0)._2 >= w(1)._2
    })
    p.unpersist()
  }

  test("train order: a permutation of the corpus, bounded shards, " +
      "sources interleaved, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val o = Curation.qTrainOrder(spark, sfDir).persist()
    // permutation: every doc exactly once, (shard, pos) is a key and
    // positions are dense 1..size within each shard
    assert(o.count() === n)
    assert(o.select("doc_id").distinct().count() === n)
    val shardStats = o.groupBy("shard")
      .agg(count(lit(1)).as("sz"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("dp"))
      .collect()
    shardStats.foreach { r =>
      assert(r.getLong(4) === r.getLong(1) && r.getLong(2) === r.getLong(1)
          && r.getLong(3) === 1L,
        s"shard ${r.getLong(0)} positions not dense 1..size")
      // shards are TrainOrderTarget-sized within a loose uniform band
      assert(r.getLong(1) > Curation.TrainOrderTarget / 4 &&
        r.getLong(1) < Curation.TrainOrderTarget * 4,
        s"shard ${r.getLong(0)} size ${r.getLong(1)} far from target")
    }
    // interleave: each shard's dominant-source share stays within a
    // loose band of the corpus share (hash mixing, not clustering)
    val globalTop = docs.groupBy("source").count()
      .orderBy(desc("count")).head.getLong(1).toDouble / n
    val worst = o.groupBy("shard", "source").count()
      .withColumn("tot", sum("count")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("shard")))
      .withColumn("share", col("count") / col("tot"))
      .agg(max("share")).head.getDouble(0)
    assert(worst < math.min(1.0, globalTop * 3 + 0.2),
      s"a shard is source-clustered: worst share $worst vs corpus $globalTop")
    // determinism: the order is a pure function of (doc_id, seed)
    val again = Curation.qTrainOrder(spark, sfDir)
    assert(o.exceptAll(again).isEmpty && again.exceptAll(o).isEmpty)
    o.unpersist()
  }
}
