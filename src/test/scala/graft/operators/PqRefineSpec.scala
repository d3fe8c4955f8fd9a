package graft
package operators

import org.apache.spark.sql.functions._

/** Per-subspace PQ codebook training: the k-means objective must be
  * non-increasing across Lloyd rounds, the 0-iteration path must be
  * the bootstrap exactly, and the trained serve must return a valid
  * top-k through the shared ADC plan. */
class PqRefineSpec extends SparkSpec {

  private def sv = {
    // mirror of Ann.pqComponents (private): fixed-point components
    // with subspace index
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("se", round(col("x").cast("double") * 1000000, 0).cast("long"))
      .withColumn("sub", floor(col("d") / Ann.SubDim).cast("long"))
  }

  test("refinement: quantization error non-increasing over rounds, " +
      "0 iterations = the bootstrap codebook") {
    val c0 = Ann.refinePqCodebooks(spark, sfDir, 0)
    val boot = Ann.pqBootstrapCents(sv)
    assert(c0.exceptAll(boot).count() === 0)
    assert(boot.exceptAll(c0).count() === 0)
    val errs = (0 to 2).map(i =>
      Ann.pqQuantError(sv, Ann.refinePqCodebooks(spark, sfDir, i)))
    assert(errs(1) <= errs(0), s"round 1 worsened: $errs")
    assert(errs(2) <= errs(1), s"round 2 worsened: $errs")
    // training must actually move the codebook on this corpus
    assert(errs(2) < errs(0), s"no improvement at all: $errs")
  }

  test("trained serve: valid top-10 via the shared ADC plan; " +
      "bootstrap serve through pqServeWith equals q_ann_pq") {
    val viaExplicit = Ann.pqServeWith(spark, sfDir,
      Ann.pqBootstrapCents(sv)).collect()
    val registry = Ann.qAnnPq(spark, sfDir).collect()
    assert(viaExplicit.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      registry.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    val trained = Ann.pqServeWith(spark, sfDir,
      Ann.refinePqCodebooks(spark, sfDir, 2)).collect()
    assert(trained.length === 10)
    assert(!trained.map(_.getLong(0)).contains(0L)) // query excluded
    // scores are the exact-rescore cosines: sorted desc, in [-1, 1]
    val scores = trained.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(s => s >= -1.0 && s <= 1.0))
  }
}
