package graft

/** The committed boundary-chunker goldens (the q_chunk_markdown /
  * q_chunk_code oracles) must match the CURRENT chunker output at the
  * Verify scale factor — chunker drift fails here, locally, before the
  * driver's DuckDB compare ever sees a stale artifact. Regenerate
  * deliberately with `runMain graft.GoldenChunks` when an intended
  * semantics change lands.
  */
class GoldenChunksSpec extends SparkSpec {

  test("boundary-chunker goldens match current output at sf0.01") {
    GoldenChunks.Queries.foreach { name =>
      val golden = spark.read.parquet(
        s"$fixturesDir/${name.stripPrefix("q_")}_sf0.01.parquet")
      val now = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      assert(now.exceptAll(golden).isEmpty && golden.exceptAll(now).isEmpty,
        s"$name drifted from its committed golden")
    }
  }
}
