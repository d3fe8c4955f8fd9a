package graft

/** Materializes the golden tables that back the non-SQL-expressible
  * oracles: `q_chunk_markdown` / `q_chunk_code` (pure-Scala boundary
  * chunkers), `q_compress_ratio` (JVM deflate), and
  * `q_bpe_train`/`q_bpe_encode` (iterated driver-side argmax loop).
  *
  * These operators are pure Scala and not SQL-expressible, so their
  * oracle is a COMMITTED ARTIFACT instead of a formula: this main runs
  * each query at the Verify scale factor
  * (sf0.01 — the driver contract) and writes the result as a
  * single-file parquet under `fixtures/`; the oracle SQL replays it
  * with `read_parquet`. Chunker CORRECTNESS is pinned independently
  * by BoundaryChunkerSpec/CstChunkerSpec against the reference's own
  * fixtures (`cst-operations*.test.ts`); the golden rows pin the
  * integrated output against drift — regenerating them is a
  * deliberate, reviewable act (rerun this main), never a side effect.
  *
  * Usage: runMain graft.GoldenChunks [sfDir] [outDir] [only]
  * (`only` = comma-separated query names — regenerate just those
  * goldens; binary parquet artifacts otherwise churn in git for
  * queries whose rows didn't change)
  */
object GoldenChunks {
  val Queries =
    Seq("q_chunk_markdown", "q_chunk_code", "q_compress_ratio",
      "q_bpe_train", "q_bpe_encode", "q_unigram_train",
      "q_unigram_encode", "q_unigram_words", "q_pq_rotation",
      "q_hnsw_search", "q_hnsw_delta", "q_hnsw_tombstone",
      "q_hnsw_filtered", "q_hnsw_batch", "q_hnsw_compact",
      "q_hnsw_dist", "q_hnsw_sharded", "q_hnsw_sharded_delta",
      "q_hnsw_sharded_filtered", "q_hnsw_routed",
      "q_hnsw_routed_adaptive", "q_hnsw_incr", "q_hnsw_incr_routed",
      "q_hnsw_incr_table", "q_hnsw_incr_table_routed")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(fixturesDir)
    val only: Set[String] =
      args.lift(2).map(_.split(",").toSet).getOrElse(Set.empty)
    val sfTag = "sf[0-9.]+".r.findFirstIn(sfDir).getOrElse("sf")
    val spark = GraftSession.local(8)
    GraftSession.setLogLevel(spark, "WARN")
    Queries.filter(q => only.isEmpty || only(q)).foreach { name =>
      val out = s"$outDir/${name.stripPrefix("q_")}_$sfTag.parquet"
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1)
        .write.mode("overwrite").parquet(out)
      println(s"[golden] wrote $out")
    }
    spark.stop()
  }
}
