package graft
import org.apache.spark.sql.SparkSession

/** Dev profiler: time named queries (or all, sorted) in one warm
  * session at a given scale dir, printing per-iteration seconds —
  * finer-grained than Bench's single min, for chasing regressions.
  *
  * Usage: runMain graft.Profile <sfDir> <iters> [name...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    GraftSession.setLogLevel(spark, "WARN")
    val all = SparkEntry.queries
    val names =
      if (args.length > 2) args.drop(2).toSeq else all.keys.toSeq.sorted
    names.foreach { n =>
      val fn = all(n)
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-22s ${ts.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
