package graft
package search

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Codebook refinement (spherical k-means over the IVF coarse
  * quantizer): first-iteration centroids equal qKmeansStep's exact
  * fixed-point means, and total assignment similarity is monotone
  * non-decreasing across iterations. */
class CodebookSpec extends SparkSpec {

  private def totalCsimMicro(cents: org.apache.spark.sql.DataFrame): Long =
    Ann.cellAssignScored(spark, sfDir, cents)
      .agg(sum("csim_micro")).head.getLong(0)

  test("one refinement iteration reproduces qKmeansStep's means") {
    val refined = Ann.refineCodebook(spark, sfDir, iters = 1)
      .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "m")))
    val step = Ann.qKmeansStep(spark, sfDir)
      .select(col("cell"), col("pos").cast("int").as("pos"),
        (col("avg_micro") / 1000000.0).as("want"))
    val joined = refined.join(step, Seq("cell", "pos"))
    assert(joined.count() === 8L * 64)
    assert(joined.filter(abs(col("m") - col("want")) > 1e-9).count() === 0)
  }

  test("total assignment similarity is non-decreasing across iterations") {
    val e = operators.Search.embNormed(spark, sfDir)
    val boot = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cv"),
        col("nrm").cast("double").as("cn"))
    val scores = Seq(
      totalCsimMicro(boot),
      totalCsimMicro(Ann.refineCodebook(spark, sfDir, 1)),
      totalCsimMicro(Ann.refineCodebook(spark, sfDir, 2)),
      totalCsimMicro(Ann.refineCodebook(spark, sfDir, 3)))
    assert(scores.sliding(2).forall(w => w(1) >= w(0)),
      s"refinement regressed assignment quality: $scores")
  }
}
