package graft

/** Dev microbench: native graft_hash60 vs the md5-hex composite over
  * N synthetic strings (row-local, no shuffle — isolates the scalar). */
object HashBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    GraftSession.setLogLevel(spark, "ERROR")
    import org.apache.spark.sql.functions._
    val base = spark.range(n).select(concat(lit("doc:"), col("id")).as("s"))
    def time(label: String)(c: org.apache.spark.sql.Column): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        base.select(c.as("h")).agg(org.apache.spark.sql.functions.bit_xor(org.apache.spark.sql.functions.col("h"))).head
        println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("native   ")(graft.embed.Embedder.hash60Col(col("s")))
    time("composite")(graft.embed.Embedder.hash60ColComposite(col("s")))
    spark.stop()
  }
}
