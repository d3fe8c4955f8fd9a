package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale experiment: replicate the documents corpus N× (planted exact
  * duplicates with shifted ids), write it as a derived table, and time
  * the scale-critical operators against it. Answers "does the plan
  * hold at k× the data" empirically, and doubles as an end-to-end
  * dedup correctness check — every fingerprint group must contain
  * exactly N members.
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [multiplier] [workDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mult = args.lift(1).map(_.toInt).getOrElse(20)
    val work = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_scale").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // derived corpus: mult copies of every doc, ids shifted per replica
    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()
    docs.crossJoin(spark.range(mult).withColumnRenamed("id", "rep"))
      .withColumn("doc_id", col("doc_id") + col("rep") * 10000000L)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    // embeddings pass through (vector ops scale-tested at base size)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")

    def time[A](name: String)(f: => A): (String, Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      (name, (System.nanoTime() - t0) / 1e9, r)
    }

    val results = Seq(
      time("exact_dedup") {
        val g = operators.Dedup.qDedupExact(spark, work)
        val bad = g.filter(col("n_docs") =!= mult.toLong).count()
        s"groups=${g.count()} wrong_size=$bad"
      },
      time("minhash_candidates") {
        val c = operators.Dedup.qDedupMinhash(spark, work)
        val perfect = c.filter(col("jaccard") === 1.0).count()
        s"pairs=${c.count()} perfect=$perfect"
      },
      time("simhash") {
        s"docs=${operators.Dedup.qDedupSimhash(spark, work).count()}"
      },
      time("keyword_freq") {
        s"rows=${operators.TextAnalysis.qKeywordFreq(spark, work).count()}"
      },
      time("semantic_search") {
        s"rows=${operators.Search.qSearchSemantic(spark, work).count()}"
      },
      time("boilerplate") {
        // replication makes every trigram corpus-shared (df ≥ mult), so
        // the probe's correctness check is that NOTHING survives the
        // keep flag — the operator must recognize a fully-templated
        // corpus as fully boilerplate.
        val b = operators.Curation.qBoilerplate(spark, work)
        s"rows=${b.count()} kept=${b.filter(col("keep")).count()}"
      },
      time("rarity") {
        s"rows=${operators.Curation.qRarity(spark, work).count()}"
      },
      time("gopher_rules") {
        s"rows=${operators.Quality.qGopherRules(spark, work).count()}"
      },
      time("substr_dedup") {
        // every replica-k>0 doc's grams all exist under a replica-0
        // doc_id, so first-occurrence-wins must drop ≥ (mult-1)/mult
        // of the corpus; survivors are a subset of replica 0.
        val s = operators.Quality.qSubstrDedup(spark, work)
        val kept = s.filter(col("keep")).count()
        s"rows=${s.count()} kept=$kept kept_outside_rep0=${
          s.filter(col("keep") && col("doc_id") >= 10000000L).count()}"
      },
      time("winnow_pairs") {
        // replicas share every fingerprint: the top pairs must all be
        // perfect-overlap (sim = 1.0)
        val p = operators.Quality.qWinnow(spark, work)
        s"pairs=${p.count()} perfect=${p.filter(col("sim") === 1.0).count()}"
      },
      time("ppl_bucket") {
        s"rows=${operators.Quality.qPplBucket(spark, work).count()}"
      })

    val expectPairs = n0 * mult.toLong * (mult - 1) / 2
    println(s"""{"probe":"scale","base_docs":$n0,"mult":$mult,""" +
      s""""derived_docs":${n0 * mult},"expected_dup_pairs":$expectPairs,""" +
      results.map { case (n, t, r) => s""""$n":{"sec":${f"$t%.2f"},"result":"$r"}""" }
        .mkString("", ",", "}"))
    spark.stop()
  }
}
