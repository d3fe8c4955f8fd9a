ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gistdexspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true

// ---- Parallel forked test groups (round 14 — the driver's `sbt test`
// gate overran its window at ~35 min; VERIFY_r13 tests_ok=false with a
// tail of only passing tests). One forked JVM ran every suite
// sequentially on a local[4] session; at sf0.001 the suites are
// JOB-LATENCY-bound (many small Spark jobs), not CPU-bound, so the fix
// is N independent JVMs each running a balanced slice — full isolation
// (suites mutate session conf and read process-global derivation
// counters, so in-JVM suite parallelism would race). N derives from
// SPARK_GRAFT_CPUS (local[4] per group), never a hard-coded core
// count; SPARK_GRAFT_TEST_GROUPS overrides.
val testGroupCount: Int = sys.env.get("SPARK_GRAFT_TEST_GROUPS")
  .map(_.toInt)
  .getOrElse {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 3 groups per 8 cores, capped at 12: the suites are JOB-LATENCY
    // bound (measured: 8 groups × local[4] averaged ~12 busy cores of
    // 32), so groups oversubscribe cores deliberately; the cap bounds
    // peak memory at 12 × testMem
    math.max(1, math.min(12, cpus * 3 / 8))
  }
// Measured per-suite wall (seconds, r14 baseline single-JVM run of
// 2026-08-18: 31:26 total, 489 tests) for the suites that dominate;
// everything unlisted defaults to 10. Only BALANCE depends on these —
// staleness can skew group sizes, never correctness. Re-measure with:
//   sbt test 2>&1 | awk '{print strftime("%T"), $0}' and diff the
//   consecutive `[info] <Suite>:` header times.
val suiteWeights: Map[String, Int] = Map(
  // the 568 s r14-baseline IncrementalIndexSpec was split in two and
  // its per-test init now copies a shared pristine layout
  "graft.search.IncrementalIndexSpec" -> 250,
  "graft.search.IncrementalServeSpec" -> 250,
  "graft.search.SearchSpec" -> 207,
  "graft.DeterminismSpec" -> 170,
  "graft.dedup.DedupSpec" -> 156,
  "graft.search.DotProductSpec" -> 124,
  "graft.operators.QualitySpec" -> 109,
  "graft.store.StoreSpec" -> 92,
  "graft.operators.EventsSpec" -> 91,
  "graft.streaming.StreamingIncrementalSpec" -> 68,
  "graft.search.HnswShardSpec" -> 68,
  "graft.search.HnswDistSpec" -> 62,
  "graft.operators.UnigramSpec" -> 35,
  "graft.search.TopKSpec" -> 32,
  "graft.search.KnnJoinSpec" -> 29,
  "graft.streaming.StreamingDedupSpec" -> 15,
  "graft.chunk.CstChunkerSpec" -> 13,
  "graft.operators.PqRotateSpec" -> 12,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // test JVMs: the production 24g default times N groups would
  // overcommit the 128 GiB box; sf0.001 suites are comfortable far
  // below it. SPARK_GRAFT_TEST_MEM overrides.
  val testMem = sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "8g")
  val opts = (Test / javaOptions).value.toVector
    .filterNot(_.startsWith("-Xmx")) :+ s"-Xmx$testMem"
  val n = testGroupCount
  // greedy bin-pack, heaviest suite into the lightest bin
  val loads = new Array[Long](n)
  val bins = Array.fill(n)(Vector.newBuilder[TestDefinition])
  tests.sortBy(t => (-suiteWeights.getOrElse(t.name, 10), t.name))
    .foreach { t =>
      val i = loads.indices.minBy(loads(_))
      loads(i) += suiteWeights.getOrElse(t.name, 10).toLong
      bins(i) += t
    }
  bins.toSeq.zipWithIndex.flatMap { case (b, i) =>
    val ts = b.result()
    if (ts.isEmpty) None
    else Some(Tests.Group(s"g$i", ts,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))))
  }
}
// sbt caps concurrent forked test groups at 1 by default; lift it to
// the group count (tasks other than tests keep the default cap).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(testGroupCount + 2, 8)),
)
// Emit forked run output verbatim (no "[info] " logger prefix): the
// bench driver machine-parses Bench's single JSON line from stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default (the harness box carries 128 GiB): local[32] is a
  // whole 32-executor cluster in one JVM, and an 8g heap leaves
  // <1 GiB of eviction-protected storage for the session caches a
  // warm serving tier lives on — concurrent heavy jobs then evict
  // the persisted lineages later queries reuse (Cache.rewarm is the
  // repair; headroom is the prevention). SPARK_DRIVER_MEM overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
