package graft
package sources

import java.nio.file.Files
import java.sql.Timestamp

class RemoteSourceSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2026-01-02 03:04:05")

  private object FakeFetcher extends RemoteFetcher {
    def fetchGist(gistId: String): Seq[(String, String)] =
      Seq(("notes.md", "# gist\n\nquokka wombat platypus " * 30))
    def fetchRepoFiles(owner: String, repo: String, branch: String,
        paths: Seq[String]): Seq[(String, String)] =
      Seq(("src/a.ts", "function numbat() { return 1 }"),
          ("logo.png", "PNG..."))
  }

  test("S4: gist url validated then indexed through the pipeline") {
    val store = Files.createTempDirectory("graft_gist").toString
    val id = "b" * 32
    val n = RemoteSource.indexGist(spark, FakeFetcher,
      s"https://gist.github.com/u/$id", store, t0)
    assert(n.isRight && n.toOption.get >= 1)
    val hits = graft.api.IndexPipeline.search(spark, store, "quokka wombat", k = 2)
    assert(hits.count() > 0)
    // invalid URL short-circuits before any fetch/index
    assert(RemoteSource.indexGist(spark, FakeFetcher,
      "https://evil.com/u/x", store, t0).isLeft)
  }

  test("S5: repo indexing gates non-text files") {
    val store = Files.createTempDirectory("graft_repo").toString
    val n = RemoteSource.indexGitHubRepo(spark, FakeFetcher,
      "https://github.com/foo/bar", "main", Seq(""), store, t0)
    assert(n.isRight)
    val chunks = spark.read.parquet(s"$store/chunks")
    // only the .ts file indexed; the .png is gated by S6
    assert(chunks.select("sourceId").distinct().count() === 1)
  }
}
