package graft
package search

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Search}

/** Quantized ANN paths: SQ8 fidelity against exact kNN, and the IVF
  * balance report's accounting identities. */
class AnnQuantSpec extends SparkSpec {

  test("sq8: 8-bit quantization shortlist recalls most of the exact top-10") {
    val exact = Search.qKnn(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val sq8 = Ann.qAnnSq8(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(sq8.size === 10)
    // 255-level per-dimension grids lose <1% of each component; the
    // 30-candidate shortlist then exact-rescores, so overlap with the
    // true top-10 should be high (exact bound data-dependent; 6 is a
    // conservative floor on the clustered synthetic embeddings)
    assert((exact & sq8).size >= 6)
  }

  test("sq8: rescored scores are the exact cosine of the shortlisted ids") {
    val e = Search.embNormed(spark, sfDir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val expected = e.crossJoin(broadcast(q))
      .withColumn("exact", round(
        graft.functions.VectorFunctions.cosinePrenormed(
          graft.functions.VectorFunctions.dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select("vec_id", "exact")
    val bad = Ann.qAnnSq8(spark, sfDir).join(expected, "vec_id")
      .filter(col("score") =!= col("exact")).count()
    assert(bad === 0)
  }

  test("topic purity: shares valid, members reconcile with the balance report") {
    val pur = Ann.qTopicPurity(spark, sfDir).collect()
    pur.foreach { r =>
      val p = r.getAs[Double]("purity")
      assert(p > 0 && p <= 1)
      assert(r.getAs[Long]("top_n") <= r.getAs[Long]("n_members"))
    }
    val bal = Ann.qIvfBalance(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_vecs")).toMap
    pur.foreach { r =>
      assert(bal(r.getAs[Long]("cell")) === r.getAs[Long]("n_members"))
    }
  }

  test("ivf balance: fractions and skew are consistent with the assignment") {
    val bal = Ann.qIvfBalance(spark, sfDir).collect()
    val total = bal.map(_.getAs[Long]("n_vecs")).sum
    assert(total === Tables.embeddings(spark, sfDir).count())
    bal.foreach { r =>
      val frac = r.getAs[Double]("frac")
      val skew = r.getAs[Double]("skew")
      assert(math.abs(
        frac - r.getAs[Long]("n_vecs").toDouble / total) < 1e-6)
      assert(math.abs(skew - frac * 8) < 1e-5)
    }
  }
}
