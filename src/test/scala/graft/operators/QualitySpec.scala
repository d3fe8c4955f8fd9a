package graft
package operators

import org.apache.spark.sql.functions._

/** Semantic invariants of the corpus-quality family (exact values are
  * oracle-checked by the Verify gate; these pin data-independent
  * properties and cross-operator consistency). */
class QualitySpec extends SparkSpec {

  test("gopher rules: ratios valid, keep flag matches its thresholds") {
    val q = Quality.qGopherRules(spark, sfDir)
    assert(q.count() === Tables.documents(spark, sfDir).count())
    assert(q.filter(col("alpha_frac") < 0 || col("alpha_frac") > 1).count() === 0)
    assert(q.filter(col("mean_word_len") <= 0).count() === 0)
    val wrongFlag = q.filter(col("keep") =!=
      (col("n_words") >= 50 && col("n_words") <= 100000 &&
        col("mean_word_len") >= 3 && col("mean_word_len") <= 10 &&
        col("symbol_ratio") <= 0.1 && col("alpha_frac") >= 0.8 &&
        col("n_stop") >= 2)).count()
    assert(wrongFlag === 0)
  }

  test("substr dedup: counts nest, the globally-first doc owns all its grams") {
    val q = Quality.qSubstrDedup(spark, sfDir)
    assert(q.filter(col("n_dup") > col("n_shared") ||
      col("n_shared") > col("n_grams")).count() === 0)
    // the smallest doc_id can never have a smaller owner
    val firstId = q.agg(min("doc_id")).head.getLong(0)
    assert(q.filter(col("doc_id") === firstId).head.getAs[Long]("n_dup") === 0L)
    // dup grams are by definition shared
    val flag = q.filter(col("keep") =!= (col("dup_frac") <= 0.5)).count()
    assert(flag === 0)
  }

  test("ppl buckets: per-language partition with ordered score ranges") {
    val q = Quality.qPplBucket(spark, sfDir).collect()
    val langs = q.map(_.getAs[String]("lang")).distinct
    langs.foreach { l =>
      val rows = q.filter(_.getAs[String]("lang") == l)
        .sortBy(_.getAs[Long]("bucket"))
      assert(rows.map(_.getAs[Long]("bucket")).toSeq ==
        (1L to rows.length).toSeq)
      // descending cut: bucket b's floor is >= bucket b+1's ceiling
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("min_score") >= b.getAs[Long]("max_score"))
        case _ => ()
      }
      // tercile sizes differ by at most one
      val ns = rows.map(_.getAs[Long]("n_docs"))
      assert(ns.max - ns.min <= 1)
    }
    // every scored doc lands in exactly one bucket
    val scored = TextAnalysis.bigramScores(spark, sfDir).count()
    assert(q.map(_.getAs[Long]("n_docs")).sum === scored)
  }

  test("winnow: ordered pairs, overlap bounded by set sizes, sim is jaccard") {
    val q = Quality.qWinnow(spark, sfDir)
    assert(q.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(q.filter(col("n_shared") > least(col("n_a"), col("n_b"))).count() === 0)
    assert(q.filter(col("sim") <= 0 || col("sim") > 1).count() === 0)
    val bad = q.withColumn("expect",
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6))
      .filter(col("sim") =!= col("expect")).count()
    assert(bad === 0)
  }

  test("vocab oov: rates are valid and token accounting is total") {
    val q = Quality.qVocabOov(spark, sfDir)
    assert(q.filter(col("oov_frac") < 0 || col("oov_frac") > 1).count() === 0)
    assert(q.filter(col("n_oov") > col("n_tokens")).count() === 0)
    val total = Tables.documents(spark, sfDir)
      .select(explode(TextAnalysis.toks(col("text"))).as("w")).count()
    assert(q.agg(sum("n_tokens")).head.getLong(0) === total)
  }

  test("dsir proxy: lifts center on 10⁶ (unit ratio) for a shared vocabulary") {
    val q = Quality.qDsirProxy(spark, sfDir)
    assert(q.count() === Tables.documents(spark, sfDir).count())
    // the synthetic corpus draws every language from one vocabulary, so
    // each term's target/raw probability ratio ≈ 1 and every document's
    // tf-weighted mean lift must sit near 10⁶ micro-units; a doc far
    // from 10⁶ would mean the ratio table or the floor-div lost mass
    assert(q.filter(col("rel_micro") < 900000L ||
      col("rel_micro") > 1100000L).count() === 0)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
    val enAvg = q.join(docs, "doc_id").filter(col("lang") === "en")
      .agg(avg("rel_micro")).head.getDouble(0)
    assert(enAvg > 950000.0 && enAvg < 1050000.0)
  }

  test("filter chain: composite flag is the AND of its family verdicts") {
    val c = Quality.qFilterChain(spark, sfDir)
    assert(c.filter(col("keep") =!= (col("keep_gopher") &&
      col("keep_rep") && col("keep_substr"))).count() === 0)
    // each family column agrees with its standalone query
    val g = Quality.qGopherRules(spark, sfDir).select("doc_id", "keep")
    val bad = c.join(g, "doc_id")
      .filter(col("keep_gopher") =!= g("keep")).count()
    assert(bad === 0)
  }

  test("winnow fingerprints: density within the winnowing guarantee") {
    // winnowing selects at least one hash per window and at most one per
    // position: 0 < |fp| <= grams, and |fp| >= grams/w (every window has
    // a min; distinct collapses runs, floor at 1)
    val fps = Quality.winnowFingerprints(spark, sfDir)
      .groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val grams = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (size(TextAnalysis.toks(col("text"))) - 4).cast("long").as("n_g"))
      .filter(col("n_g") >= 4) // >= k+w-1 tokens => at least one full window
    val joined = fps.join(grams, "doc_id")
    assert(joined.filter(col("n_fp") < 1 || col("n_fp") > col("n_g")).count() === 0)
    assert(fps.count() === grams.count())
  }

  test("compression ratio: deterministic, separates repetition from variety") {
    val a = Quality.qCompressRatio(spark, sfDir)
    val b = Quality.qCompressRatio(spark, sfDir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() === Tables.documents(spark, sfDir).count())
    assert(a.filter(col("deflate_bytes") <= 0 ||
      col("deflate_bytes") > col("raw_bytes") + 64).count() === 0)
    assert(a.filter(col("keep") =!=
      (col("ratio_milli") >= 250 && col("ratio_milli") <= 950)).count() === 0)
    // the signal itself: pure repetition deflates far below varied text
    def ratio(s: String): Long =
      Quality.deflateLen(s.getBytes("UTF-8")) * 1000 / s.length
    val repeated = ("spam " * 200).trim
    val varied = (1 to 200).map(i => s"w${i * 7919 % 1000}").mkString(" ")
    assert(ratio(repeated) < ratio(varied) / 3)
  }
}
