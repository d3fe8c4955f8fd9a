package graft

import org.apache.spark.sql.SparkSession

/** Standard engine session settings, shared by Verify / Bench / tests.
  *
  * Scale notes (100 TB design): AQE on so skewed shuffles re-plan at
  * runtime; shuffle partitions default to the local core count (the
  * driver passes SPARK_GRAFT_CPUS; a real cluster would set this to
  * 2-3× total cores or rely on AQE coalescing).
  */
object GraftSession {

  /** The engine carries a small allowlist of DELIBERATE unpartitioned
    * windows (five registry queries, PlanAuditSpec.boundedWindowQueries),
    * each over a table bounded by construction (embedding dims ≤ 64,
    * language count, ≤ 4096 shard segments, top-20 fusion arms —
    * bounds pinned in PlanAuditSpec). WindowExec's "No Partition
    * Defined" warning cannot be silenced per-site (a literal partition
    * key is constant-folded away), so the window-exec logger package
    * is raised to ERROR — honestly: PlanAuditSpec's registry-wide
    * audit FAILS on any unpartitioned WindowExec outside the
    * allowlist, and pins the exact keyless-WindowExec COUNT per
    * allowlisted query, so a new keyless window a refactor introduces
    * — even inside an allowlisted query — is caught by CI, not by log
    * noise (a per-site bound pin alone could not see new windows; the
    * audit scans every registry plan). */
  private def silenceAuditedWindowWarning(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)

  /** Root log level for mains/tests. `sparkContext.setLogLevel`
    * resets EVERY logger's level (log4j2 setAllLevels), which silently
    * undid the targeted window-warning override when callers invoked
    * it directly — route through here so the override survives. */
  def setLogLevel(spark: SparkSession, level: String): Unit = {
    spark.sparkContext.setLogLevel(level)
    silenceAuditedWindowWarning()
  }

  def builder(master: String, shufflePartitions: String): SparkSession.Builder = {
    silenceAuditedWindowWarning()
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      // per-JVM warehouse: bucketed tables (ChunkStore.writeBucketed)
      // live in catalog metadata that dies with the in-memory catalog,
      // so a persistent ./spark-warehouse leaves orphaned directories
      // that break the NEXT JVM's saveAsTable (LOCATION_ALREADY_EXISTS)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.ts is parquet TIMESTAMP(NANOS) — read as long, converted
      // in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // this VM's host can freeze the guest for minutes at a time
      // (SCALE.md round 6); the default 120s heartbeat timeout then
      // kills healthy long jobs in local mode. 10 min absorbs observed
      // stalls; a real cluster would tune this per-fleet.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      // a long warm session accumulates many MEMORY_AND_DISK caches
      // (Cache.getOrBuild); the default storageFraction=0.5 PROTECTS
      // half the unified region for them, and a heavy join/aggregate
      // under full 32-way concurrency can then fail to acquire
      // execution pages outright (observed: q_simhash_topk at the 10×
      // sweep, UNABLE_TO_ACQUIRE_MEMORY while its exhaustive twin
      // ran). Caches are cheap to re-read from disk; execution memory
      // is not substitutable — so protect less of it.
      .config("spark.memory.storageFraction", "0.2")
      // every ObjectHashAggregate here carries a BOUNDED buffer (the
      // top-k/min-k aggregators: ≤ k entries per group), so hash-map
      // memory is O(groups-per-task × k) — predictable and small. The
      // default sortBased.fallbackThreshold=128 instead routed the
      // whole input of any >128-group task through an unsafe KV
      // sorter, whose pointer-array growth is the one allocation that
      // CANNOT spill itself out of pressure (observed: q_simhash_topk
      // OOM at the 10× sweep inside SortBasedAggregator.addInput
      // while the hash path would have held ~20k × ~500 B). 500k keys
      // ≈ 250 MB/task worst case — within a 4 GB/task budget; truly
      // pathological partitions still fall back. */
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "500000")
  }

  /** Local session for tests. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(s"local[$cores]", cores.toString).getOrCreate()
    setLogLevel(s, "WARN")
    s
  }
}
