package graft

import org.apache.spark.sql.DataFrame

import graft.api.CurationPipeline

/** Dev probe: per-stage wall breakdown of `q_pipeline_full`
  * ([[graft.api.CurationPipeline.full]]) — r13 verdict item 5 asked
  * for a committed stage profile of the registry's heaviest row
  * before touching it. Builds the stages through full()'s OWN
  * lineage builders (CurationPipeline.stage*, round-14 review: a
  * hand-copied mirror drifts the moment full() changes) with a timer
  * at each stage's first materialization, so each number is that
  * stage's INCREMENTAL cost in the warm session; iteration 2 shows
  * what a warm re-run (the bench's timed pass) pays per stage.
  *
  * Usage: runMain graft.PipelineStageProbe [sfDir] [iters]
  */
object PipelineStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    GraftSession.setLogLevel(spark, "WARN")

    def t[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(s"pipeprobe:$label")
      val t0 = System.nanoTime()
      val r = f
      println(f"[pipeprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    (1 to iters).foreach { it =>
      println(s"[pipeprobe] --- iteration $it ---")
      val tAll0 = System.nanoTime()
      val docs = CurationPipeline.stageDocs(spark, sfDir)
      val s2 = CurationPipeline.stageQuality(spark, sfDir, docs)
      t("s2_quality(count)") { s2.count() }
      val s3 = CurationPipeline.stageExact(s2)
      t("s3_exact(count)") { s3.count() }
      val s4 = CurationPipeline.stageDecon(spark, sfDir, s3)
      t("s4_decon(count)") { s4.count() }
      val labels = t("s5_components") {
        CurationPipeline.neardupLabels(spark, sfDir, s4)
      }
      val s5 = CurationPipeline.stageNeardup(s4, labels)
      t("s5_neardup(count)") { s5.count() }
      val s6 = CurationPipeline.stageSample(s5)
      t("s6_sample(count)") { s6.count() }
      val packed = CurationPipeline.stagePacked(spark, sfDir, s6)
      t("s7_pack(count)") { packed.count() }
      t("accts(6 concurrent aggs)") {
        graft.model.Pools.mapConcurrent(
          Seq[DataFrame](docs, s2, s3, s4, s5, s6), 6)(
          CurationPipeline.stageAcct)
      }
      Seq(s2, s4, s5, s6).foreach(_.unpersist(false))
      println(f"[pipeprobe] TOTAL ${(System.nanoTime() - tAll0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
