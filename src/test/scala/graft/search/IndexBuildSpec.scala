package graft
package search

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Batch index build + probe (the north-star split): the prebuilt
  * index must serve probes with results identical to the from-scratch
  * computation, and its layout must prune to the probed cells. */
class IndexBuildSpec extends SparkSpec {

  test("prebuilt IVF index probe == from-scratch qAnnIvf") {
    val idx = Files.createTempDirectory("graft_idx").toString
    Ann.buildIndexes(spark, sfDir, idx)
    val probed = Ann.probeIvfIndex(spark, sfDir, idx)
    val scratch = Ann.qAnnIvf(spark, sfDir)
    assert(probed.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(probed).isEmpty)
    // layout: one directory per cell / bucket — a probe reads 2 dirs
    assert(new java.io.File(s"$idx/ivf").listFiles()
      .exists(_.getName.startsWith("cell=")))
    assert(new java.io.File(s"$idx/lsh").listFiles()
      .exists(_.getName.startsWith("bucket=")))
    // partition pruning on the probe path
    val plan = spark.read.parquet(s"$idx/ivf")
      .filter(col("cell") === 3).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cell"))
  }

  test("batch IVF probe: query 0's page == single-query qAnnIvf head") {
    // the one-job batch formulation must reproduce the single-query
    // plan result for each member query: same probe cells, same
    // candidates, same scores, same tie-breaks
    val batch0 = Ann.qAnnIvfBatch(spark, sfDir)
      .filter(col("query_id") === 0)
      .select("vec_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val single0 = Ann.qAnnIvf(spark, sfDir)
      .select("vec_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq.take(5)
    assert(batch0 === single0)
    // every query gets exactly 5 ranked rows, ranks 1..5, scores
    // non-increasing within a query
    val all = Ann.qAnnIvfBatch(spark, sfDir).collect()
    assert(all.map(_.getLong(0)).distinct.length === 8)
    all.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getLong(1)).toSeq.sorted === (1L to 5L))
      val scores = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("delta-segment serving: attribution matches the cutoff and the " +
      "delta side is exhaustive") {
    val out = Ann.qAnnDelta(spark, sfDir).collect()
    assert(out.length === 10)
    assert(!out.exists(_.getLong(0) == 0L)) // query excluded
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // segment attribution must match the 90% id cutoff
    val ids = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .agg(min("vec_id"), max("vec_id")).head
    val cutoff = ids.getLong(0) + ((ids.getLong(1) - ids.getLong(0) + 1) * 9) / 10
    assert(out.forall { r =>
      (r.getString(1) == "delta") == (r.getLong(0) >= cutoff)
    })
    // the delta side is brute-forced, so every delta vector scoring
    // above the 10th result MUST be present (no recall loss on fresh
    // data — the property the pattern exists for)
    val floor = scores.last
    val e = graft.operators.Search.embNormed(spark, sfDir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    import graft.functions.VectorFunctions._
    val deltaAbove = e.filter(col("vec_id") >= cutoff)
      .crossJoin(broadcast(q))
      .withColumn("score", round(
        cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .filter(col("score") > floor)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val served = out.filter(_.getString(1) == "delta").map(_.getLong(0)).toSet
    assert(deltaAbove.subsetOf(served))
  }
}
