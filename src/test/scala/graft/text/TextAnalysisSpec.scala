package graft
package text

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("token counting: ws tokens ≤ chars, est_tokens = ceil(chars/4)") {
    val tc = TextAnalysis.qTokenCount(spark, sfDir)
    assert(tc.filter(col("n_ws_tokens") > col("n_chars")).count() === 0)
    assert(tc.filter(col("est_tokens") =!= ceil(col("n_chars") / 4.0).cast("long"))
      .count() === 0)
  }

  test("quality: ttr and quality are in (0,1], distinct ≤ words") {
    val q = TextAnalysis.qTextQuality(spark, sfDir)
    assert(q.filter(col("n_distinct") > col("n_words")).count() === 0)
    assert(q.filter(col("ttr") <= 0 || col("ttr") > 1).count() === 0)
    assert(q.filter(col("quality") <= 0 || col("quality") > 1).count() === 0)
  }

  test("bigram phrases: 'a b c' yields exactly its two consecutive pairs") {
    import spark.implicits._
    val t = TextAnalysis.toks(lit("a b  c"))
    val phrases = Seq(1).toDF("x")
      .select(explode(transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))).as("p"))
      .as[String].collect().toSeq
    assert(phrases === Seq("a b", "b c"))
  }

  test("fingerprint: bow_hash invariant to word order, content_hash not") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
      md5(col("text")).as("content_hash"),
      md5(array_join(array_sort(array_distinct(TextAnalysis.toks(col("text")))), " "))
        .as("bow_hash")).collect().sortBy(_.getLong(0))
    assert(fp(0).getString(2) === fp(1).getString(2))
    assert(fp(0).getString(1) !== fp(1).getString(1))
  }

  test("inverted index: df/total_tf consistent, postings ≤5 and tf-ordered") {
    val q = TextAnalysis.qInvertedIndex(spark, sfDir).cache()
    assert(q.count() === 20)
    // df ≥ postings length ≥ 1; total_tf ≥ df (each posting has tf ≥ 1)
    val bad = q
      .withColumn("plen", size(split(col("postings"), ",")).cast("long"))
      .filter(col("plen") < 1 || col("plen") > 5 ||
        col("df") < col("plen") || col("total_tf") < col("df"))
      .count()
    assert(bad === 0)
    // cross-check one term's df against a direct count
    val term = q.head.getString(0)
    val direct = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(TextAnalysis.toks(col("text"))).as("t"))
      .filter(col("t") === term).select("doc_id").distinct().count()
    assert(q.filter(col("term") === term).head.getAs[Long]("df") === direct)
    q.unpersist()
  }

  test("pii scrub: planted emails/IPs/phones are counted and redacted") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 10.0.255.3 now"),
      (2L, "call 555-123-4567 or 555.987.6543 today"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val counted = df.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.EmailRe), lit(0))).as("e"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.Ipv4Re), lit(0))).as("i"),
      size(regexp_extract_all(col("text"), lit(TextAnalysis.PhoneRe), lit(0))).as("p"),
      TextAnalysis.scrubPii(col("text")).as("scrubbed"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(counted(1L).getInt(1) === 1 && counted(1L).getInt(2) === 1)
    assert(counted(2L).getInt(3) === 2)
    assert(counted(1L).getString(4) === "contact <EMAIL> or <IP> now")
    assert(counted(2L).getString(4) === "call <PHONE> or <PHONE> today")
    assert(counted(3L).getString(4) === "no pii here at all")
    // the corpus query: digest accounts every doc, clean_docs ≤ n_docs
    val q = TextAnalysis.qPiiScrub(spark, sfDir)
    assert(q.filter(col("clean_docs") > col("n_docs")).count() === 0)
    val total = Tables.documents(spark, sfDir).count()
    assert(q.agg(sum("n_docs")).head.getLong(0) === total)
  }

  test("bigram LM: probabilities are valid conditionals, uniform-phrase doc scores high") {
    val q = TextAnalysis.qBigramLm(spark, sfDir).cache()
    // every doc with ≥2 tokens gets a row; avg_prob ∈ (0, 1]
    val withBigrams = Tables.documents(spark, sfDir)
      .filter(size(TextAnalysis.toks(col("text"))) >= 2).count()
    assert(q.count() === withBigrams)
    assert(q.filter(col("avg_prob_micro") <= 0 ||
      col("avg_prob_micro") > 1000000L).count() === 0)
    // micro-unit accounting: sum_micro ≤ n_bigrams · 10⁶ (each p ≤ 1)
    assert(q.filter(col("sum_micro") > col("n_bigrams") * 1000000L).count() === 0)
    q.unpersist()
  }

  test("doc keywords: top-3 per doc, scores monotone, rarity beats frequency") {
    val q = TextAnalysis.qDocKeywords(spark, sfDir).cache()
    val perDoc = q.groupBy("doc_id").agg(count(lit(1)).as("n"), max("rk").as("mx"))
    assert(perDoc.filter(col("n") > 3 || col("mx") =!= col("n")).count() === 0)
    // rank order is score order within each doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rk")
    val inversions = q
      .withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("score")).count()
    assert(inversions === 0)
    // score recomputes from the row's own tf/df and the corpus size
    val n = Tables.documents(spark, sfDir).count()
    assert(q.filter(col("score") =!=
      col("tf") * expr(s"$n * 1000000L div df")).count() === 0)
    q.unpersist()
  }

  test("temperature sampling: weights bounded, boost ≥ 1, largest stratum is 1.0") {
    import graft.operators.Curation
    val q = Curation.qTempSampling(spark, sfDir).cache()
    assert(q.filter(col("temp_weight") <= 0 || col("temp_weight") > 1).count() === 0)
    assert(q.filter(col("boost") < 1.0).count() === 0)
    assert(q.filter(col("temp_weight") === 1.0).count() >= 1)
    // share sums to 1 within rounding
    val s = q.agg(sum("share")).head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-4)
    q.unpersist()
  }

  test("collocations: lift is the exact count quotient, support ≥ 5") {
    val q = TextAnalysis.qCollocations(spark, sfDir).cache()
    assert(q.filter(col("c_ab") < 5).count() === 0)
    // a bigram can't occur more often than either word
    assert(q.filter(col("c_ab") > col("c_a") || col("c_ab") > col("c_b"))
      .count() === 0)
    // lift recomputes from the row's own integer counts
    val total = Tables.documents(spark, sfDir)
      .select(size(TextAnalysis.toks(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head.getLong(0)
    val wrong = q.filter(
      abs(col("lift") - round(col("c_ab").cast("double") * total /
        (col("c_a") * col("c_b")).cast("double"), 6)) > 1e-12).count()
    assert(wrong === 0)
    q.unpersist()
  }
}
