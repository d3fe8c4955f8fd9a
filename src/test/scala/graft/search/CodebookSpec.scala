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

  test("serving against the refined codebook: build/probe round-trip " +
      "is exact and cell-consistent") {
    val idx = java.nio.file.Files.createTempDirectory("graft_cb").toString
    val cents = Ann.refineCodebook(spark, sfDir, iters = 2)
    Ann.buildIndexWith(spark, sfDir, cents, idx)
    // one assignment row per vector, cells drawn from the codebook
    val assign = store.ChunkStore.read(spark, s"$idx/ivf")
    assert(assign.count() === Tables.embeddings(spark, sfDir).count())
    assert(assign.groupBy("vec_id").count().filter(col("count") > 1)
      .count() === 0)
    val out = Ann.probeIvfIndexWith(spark, sfDir, cents, idx).collect()
    assert(out.length === 10)
    // every hit comes from the probed 2 cells and is exactly scored:
    // recompute each score brute-force and compare
    val scores = Ann.cellAssignScored(spark, sfDir, cents)
    // partition-column reads come back as Int — compare as Number
    def cellOf(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue
    val byId = scores.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> cellOf(r, 1)).toMap
    val probed = out.map(cellOf(_, 1)).toSet
    assert(probed.size <= 2)
    assert(out.forall(r => byId(r.getLong(0)) == cellOf(r, 1)))
    val exact = operators.Search.qKnn(spark, sfDir)
      .select("vec_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // any probe hit that IS an exact-top-10 member must carry the
    // identical rounded cosine
    out.foreach { r =>
      exact.get(r.getLong(0)).foreach(s => assert(s === r.getDouble(2)))
    }
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
