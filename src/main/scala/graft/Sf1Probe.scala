package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off sf1-equivalent bench probe (VERDICT r5 item 10): replicate
  * the sf0.1 corpus 10× — documents, events, lineitem, and embeddings,
  * each with per-replica id shifts — and time the slowest registry
  * queries from BENCH_r05 against it, cold and steady-state. Answers
  * "does the flat profile hold another 10×" without registering a new
  * scale factor in the driver contract. Results land in SCALE.md.
  *
  * Usage: runMain graft.Sf1Probe [srcDir] [mult] [workDir]
  */
object Sf1Probe {
  val SlowQueries: Seq[String] = Seq(
    "q_curation_manifest", "q_winnow", "q_boilerplate", "q_doc_keywords",
    "q_inverted_index", "q_lsh_tune", "q_window_dedup", "q1_agg",
    "q_decontaminate", "q_ann_pq")

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_sf1").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: org.apache.spark.sql.DataFrame,
        shifts: (String, Long)*): org.apache.spark.sql.DataFrame = {
      val rep = df.crossJoin(
        spark.range(mult).withColumnRenamed("id", "rep"))
      shifts.foldLeft(rep) { case (d, (c, unit)) =>
        d.withColumn(c, col(c) + col("rep") * unit)
      }.drop("rep")
    }
    replicate(Tables.documents(spark, srcDir), "doc_id" -> 10000000L)
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    replicate(Tables.events(spark, srcDir),
        "user_id" -> 10000000L, "event_id" -> 1000000000L)
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    replicate(Tables.lineitem(spark, srcDir), "l_orderkey" -> 100000000L)
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    replicate(Tables.embeddings(spark, srcDir), "vec_id" -> 10000000L)
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")

    val rows = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SlowQueries.foreach { name =>
      val q = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        q(spark, work).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val steady = once()
      rows(name) = f"""{"cold":$cold%.2f,"steady":$steady%.2f}"""
    }
    println(s"""{"probe":"sf1","src":"$srcDir","mult":$mult,""" +
      rows.map { case (k, v) => s""""$k":$v""" }.mkString("", ",", "}"))
    spark.stop()
  }
}
