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
}
