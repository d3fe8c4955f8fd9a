package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Quality}

/** Dev probe: per-stage wall breakdown of `q_pipeline_full`
  * ([[graft.api.CurationPipeline.full]]) — r13 verdict item 5 asked
  * for a committed stage profile of the registry's heaviest row
  * before touching it. Mirrors full()'s stages verbatim (same
  * operators, same persists) with a timer at each stage's first
  * materialization, so each number is that stage's INCREMENTAL cost
  * in the warm session; iteration 2 shows what a warm re-run (the
  * bench's timed pass) pays per stage.
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
    import spark.implicits._

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
      val docs = Tables.documents(spark, sfDir)
        .select("doc_id", "lang", "source", "n_chars", "text")

      val s2 = docs.join(
        Quality.qFilterChain(spark, sfDir).filter(col("keep"))
          .select("doc_id"), "doc_id").persist()
      t("s2_quality(count)") { s2.count() }

      val exactWinners = s2
        .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val s3 = s2.join(exactWinners, "doc_id")
      t("s3_exact(count)") { s3.count() }

      val s4 = s3.filter(col("doc_id") >= 20)
        .join(Dedup.contaminatedMajority(spark, sfDir),
          Seq("doc_id"), "left_anti").persist()
      t("s4_decon(count)") { s4.count() }

      val ids4 = s4.select("doc_id")
      val pairs = Dedup.nearDupPairs(spark, sfDir)
        .filter(col("jaccard") >= 0.5)
        .join(ids4.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(ids4.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select("doc_a", "doc_b")
      val labels = t("s5_components") { Dedup.componentsOf(spark, pairs) }
      val ndLosers = labels.join(s4.select("doc_id", "n_chars"), "doc_id")
        .groupBy("grp")
        .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("b"))
        .select(col("grp"), (-col("b.nid")).as("kept_doc"))
        .join(labels, "grp")
        .filter(col("doc_id") =!= col("kept_doc"))
        .select("doc_id")
      val s5 = s4.join(ndLosers, Seq("doc_id"), "left_anti").persist()
      t("s5_neardup(count)") { s5.count() }

      val s6 = s5.join(
        Curation.weightedSampleFrom(
          s5.select("lang", "doc_id", "n_chars")).select("doc_id"),
        "doc_id").persist()
      t("s6_sample(count)") { s6.count() }

      val packed = Curation.packFrom(
        s6.select("doc_id")
          .join(Curation.docTokCounts(spark, sfDir), "doc_id")
          .select("doc_id", "source", "tok"))
      t("s7_pack(count)") { packed.count() }

      def acct(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)),
          coalesce(sum("n_chars"), lit(0L)).cast("long")).head
        (r.getLong(0), r.getLong(1))
      }
      t("accts(6 concurrent aggs)") {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
        try Seq(docs, s2, s3, s4, s5, s6).map(df =>
          pool.submit(new java.util.concurrent.Callable[(Long, Long)] {
            def call(): (Long, Long) = acct(df)
          })).foreach(_.get())
        finally pool.shutdown()
      }
      Seq(s2, s4, s5, s6).foreach(_.unpersist(false))
      println(f"[pipeprobe] TOTAL ${(System.nanoTime() - tAll0) / 1e9}%8.3f s")
    }
    spark.stop()
  }
}
