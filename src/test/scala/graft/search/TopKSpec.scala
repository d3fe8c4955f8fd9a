package graft
package search

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.functions.VectorFunctions._

/** The single-pass TopKAggregator must produce exactly the window
  * formulation's per-group top-5 (same ordering, same tie-breaks). */
class TopKSpec extends SparkSpec {

  test("aggregator top-5 == window row_number top-5 on batch kNN") {
    val spark2 = spark
    import spark2.implicits._
    val e = operators.Search.embNormed(spark, sfDir)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .select(col("query_id"), col("vec_id"), col("score"))
      .as[(Long, Long, Double)]

    val viaAgg = scored
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TopKAggregator.topK(5))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((vid, s), i) => (qid, i.toLong + 1, vid, s) }
      }
      .toDF("query_id", "rank", "vec_id", "score")

    val viaWindow = operators.Search.qKnnBatch(spark, sfDir)
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("stratified min-k aggregator == window row_number stratified sample") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.embed.Embedder.hash60Col
    // the shipped aggregator plan
    val viaAgg = operators.Curation.qSampleStrat(spark, sfDir)
    // the window formulation it replaced (still the oracle's shape)
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    val viaWindow = Tables.documents(spark, sfDir)
      .withColumn("h",
        hash60Col(concat(lit("samp:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= operators.Curation.SampleK)
      .select("lang", "rk", "doc_id", "n_chars")
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("inverted-index postings: aggregator top-5 == per-term window top-5") {
    import org.apache.spark.sql.expressions.Window
    // the shipped aggregator plan
    val viaAgg = operators.TextAnalysis.qInvertedIndex(spark, sfDir)
    // the per-term rank-window formulation it replaced (the oracle's
    // shape; unshippable at scale — df(hot term) rows in one task)
    val tf = operators.TextAnalysis.termFreqs(spark, sfDir)
    val w = Window.partitionBy("term").orderBy(desc("tf"), col("doc_id"))
    val postings = tf.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .groupBy("term")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rk"), col("doc_id")))),
          x => x.getField("doc_id").cast("string")), ",").as("postings"))
    val viaWindow = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      .join(postings, "term")
      .orderBy(desc("df"), col("term"))
      .limit(20)
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("min-k pair buffer stays bounded, sorted, exact on 60-bit keys") {
    val agg = new graft.functions.MinKPairAggregator(3)
    // keys past 2^53 — a Double cast would collapse these neighbors
    val big = (1L << 60) - 1L
    val xs = Seq((big, 9L), (big - 1L, 8L), (5L, 1L), (5L, 0L), (7L, 2L))
    val half1 = xs.take(2).foldLeft(agg.zero)(agg.reduce)
    val half2 = xs.drop(2).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(half1, half2))
    assert(merged === Seq((5L, 0L), (5L, 1L), (7L, 2L)))
  }

  test("buffer stays bounded and sorted under merges") {
    val agg = new TopKAggregator(3)
    val xs = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
    val half1 = xs.take(2).foldLeft(agg.zero)(agg.reduce)
    val half2 = xs.drop(2).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(half1, half2))
    assert(merged === Seq((2L, 0.9), (3L, 0.9), (5L, 0.7)))
    assert(merged.length <= 3)
  }

  test("hard negatives: never the query's label, equals the window plan") {
    val out = operators.Ann.qHardNegatives(spark, sfDir)
    val labels = Tables.embeddings(spark, sfDir).select("vec_id", "label")
    val shared = out
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "qlabel"), "query_id")
      .join(labels, "vec_id")
      .filter(col("label") === col("qlabel"))
    assert(shared.count() === 0)
    // window twin (the oracle formulation) must agree row for row
    val e = operators.Search.embNormed(spark, sfDir)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qv"), col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), col("vec_id"))
    val viaWindow = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") &&
        col("label") =!= col("qlabel"))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
    assert(out.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(out).isEmpty)
  }
}
