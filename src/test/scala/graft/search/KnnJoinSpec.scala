package graft
package search

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.{Ann, Search}

/** All-pairs kNN join: neighbors must come from the query's LSH
  * bucket, be exactly scored, and be the bucket's true top-3. */
class KnnJoinSpec extends SparkSpec {

  test("knn join: every neighbor shares the query's bucket, top-3 exact") {
    val out = Ann.qKnnJoin(spark, sfDir)
    val b = Ann.lshBuckets(spark, sfDir)
    // neighbor always bucket-mate
    val crossBucket = out
      .join(b.withColumnRenamed("bucket", "qb"), "vec_id")
      .join(b.select(col("vec_id").as("neighbor_id"),
        col("bucket").as("nb")), "neighbor_id")
      .filter(col("qb") =!= col("nb"))
    assert(crossBucket.count() === 0)
    // ranks are 1..k dense per vector, scores non-increasing
    val badRank = out.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(badRank.count() === 0)
    // spot-exactness: for the largest bucket, rank-1 equals the
    // brute-force best bucket-mate
    val big = b.groupBy("bucket").count().orderBy(desc("count"), col("bucket"))
      .head.getLong(0)
    val members = b.filter(col("bucket") === big)
    val e = Search.embNormed(spark, sfDir).join(members, "vec_id")
    val brute = e.alias("a").join(e.alias("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("score",
        round(cosinePrenormed(dot(col("a.embedding"), col("b.embedding")),
          col("a.nrm"), col("b.nrm")), 6))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("a.vec_id"))
          .orderBy(desc("score"), col("b.vec_id"))))
      .filter(col("rn") === 1)
      .select(col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("bf_neighbor"), col("score").as("bf_score"))
    val mismatch = out.filter(col("rank") === 1)
      .join(brute, "vec_id")
      .filter(col("neighbor_id") =!= col("bf_neighbor") ||
        col("score") =!= col("bf_score"))
    assert(mismatch.count() === 0)
  }

  test("bitext mining: cross-lingual pairs only, one per query, " +
      "margin beats or equals raw-cosine ordering semantics") {
    val out = Ann.qMineBitext(spark, sfDir).cache()
    val langs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    // every mined pair is en → non-en, and the reported lang is the
    // candidate's true lang
    val sides = out
      .join(langs.select(col("doc_id").as("en_id"),
        col("lang").as("src_lang")), "en_id")
      .join(langs.select(col("doc_id").as("other_id"),
        col("lang").as("true_lang")), "other_id")
    assert(sides.filter(col("src_lang") =!= "en").count() === 0)
    assert(sides.filter(col("lang") === "en").count() === 0)
    assert(sides.filter(col("lang") =!= col("true_lang")).count() === 0)
    // at most one mined pair per English doc; scores positive;
    // output ordered by margin desc
    assert(out.groupBy("en_id").count().filter(col("count") > 1)
      .count() === 0)
    assert(out.filter(col("score_micro") <= 0).count() === 0)
    // candidates are bucket-mates: every mined pair must share an LSH
    // bucket (guards the self-join ambiguity where the bucket equality
    // collapses to `true` and candidates widen to all cross-lingual pairs)
    val bk = Ann.lshBuckets(spark, sfDir)
    val offBucket = out
      .join(bk.select(col("vec_id").as("en_id"),
        col("bucket").as("eb")), "en_id")
      .join(bk.select(col("vec_id").as("other_id"),
        col("bucket").as("ob")), "other_id")
      .filter(col("eb") =!= col("ob"))
    assert(offBucket.count() === 0)
    val margins = out.select("margin_micro").collect().map(_.getLong(0))
    assert(margins.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    out.unpersist()
  }

  test("label noise: agreement accounting conserves the knn row count") {
    val out = Ann.qLabelNoise(spark, sfDir).persist()
    // agreement never exceeds neighborhood size; suspects never exceed
    // vectors; fractions valid
    assert(out.filter(col("n_agree") > col("n_neighbors")).count() === 0)
    assert(out.filter(col("n_suspect") > col("n_vecs")).count() === 0)
    assert(out.filter(col("agree_frac_micro") > 1000000L ||
      col("agree_frac_micro") < 0L).count() === 0)
    // every knn edge lands in exactly one label row
    val knnRows = Ann.qKnnJoin(spark, sfDir).count()
    assert(out.agg(sum("n_neighbors")).head.getLong(0) === knnRows)
    // the corpus's planted exact-duplicate embeddings share labels, so
    // SOME agreement must exist
    assert(out.agg(sum("n_agree")).head.getLong(0) > 0)
    out.unpersist()
  }

  test("emb outliers: bottom-10 ascending, cell stats consistent") {
    val out = Ann.qEmbOutliers(spark, sfDir).collect()
    assert(out.length === 10)
    val sims = out.map(_.getLong(2))
    assert(sims.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    // joined cell stats agree with an independent recount
    val byCell = operators.Ann.qIvfBalance(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall(r => byCell(r.getLong(1)) == r.getLong(3)))
  }

  test("media error channel: exactly the planted corruptions fail") {
    val out = operators.Media.qMediaErrors(spark, sfDir)
    assert(out.filter((col("doc_id") % 97 === 0) =!=
      (col("status") === "error")).count() === 0)
    assert(out.filter(col("status") === "error" &&
      col("n_samples").isNotNull).count() === 0)
    assert(out.filter(col("status") === "ok" &&
      col("n_samples").isNull).count() === 0)
  }
}
