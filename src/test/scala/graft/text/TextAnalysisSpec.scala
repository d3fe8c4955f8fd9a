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
