package graft
package api

import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {

  test("curate: attrition is monotone and the written corpus matches stage 3") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curated").toString
    val manifest = CurationPipeline.curate(spark, sfDir, out).collect()
    assert(manifest.map(_.getAs[String]("name")).toSeq ==
      Seq("input", "after_quality", "after_neardup"))
    val ns = manifest.map(_.getAs[Long]("n_docs"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2) && ns(2) > 0)
    val chars = manifest.map(_.getAs[Long]("n_chars"))
    assert(chars(0) >= chars(1) && chars(1) >= chars(2))
    // the parquet output IS stage 3 (round-trip, partitioned by lang)
    val written = spark.read.parquet(out)
    assert(written.count() === ns(2))
    assert(written.columns.contains("lang"))
  }

  test("curate: survivors contain no near-dup pair members except representatives") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_curated2").toString
    CurationPipeline.curate(spark, sfDir, out)
    val survivors = spark.read.parquet(out).select("doc_id")
    val labels = operators.Dedup.componentLabels(spark, sfDir)
    val reps = operators.Dedup.qSemdedup(spark, sfDir).select("kept_doc")
    // any surviving component member must be its component's representative
    val bad = survivors.join(labels, "doc_id")
      .join(reps, survivors("doc_id") === reps("kept_doc"), "left_anti")
      .count()
    assert(bad === 0)
  }
}
