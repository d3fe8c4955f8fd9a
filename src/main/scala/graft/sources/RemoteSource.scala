package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.api.IndexPipeline
import graft.security.Security

/** Remote sources (S4 gist / S5 GitHub repo) behind an injectable
  * fetcher trait — the network client is a seam, exactly like the
  * reference's mocked embedding/network layer in its own tests
  * (SURVEY.md §7.5: "network sources may be stubbed behind the same
  * trait"). URL validation (X13) runs before any fetch.
  *
  * Scale note: fetch happens driver-side for gists (a handful of
  * files); for repo trees the file list would be parallelized and
  * fetched per partition with rate limiting (reference
  * `github-rate-limiter.ts`) — the indexing side is the same
  * IndexPipeline path either way.
  */
trait RemoteFetcher extends Serializable {
  /** gist id → (fileName, content) pairs. */
  def fetchGist(gistId: String): Seq[(String, String)]
  /** owner/repo/branch → (path, content) pairs under `paths`. */
  def fetchRepoFiles(owner: String, repo: String, branch: String,
      paths: Seq[String]): Seq[(String, String)]
}

object RemoteSource {

  /** S4: validate the gist URL, fetch its files, index each as text. */
  def indexGist(spark: SparkSession, fetcher: RemoteFetcher, url: String,
      storePath: String, createdAt: Timestamp): Either[String, Long] =
    Security.validateGistUrl(url).map { gistId =>
      fetcher.fetchGist(gistId).map { case (name, content) =>
        IndexPipeline.indexText(spark, content, s"gist:$gistId/$name",
          storePath, createdAt).chunks
      }.sum
    }

  /** S5: validate the repo URL, fetch the tree slice, index each file. */
  def indexGitHubRepo(spark: SparkSession, fetcher: RemoteFetcher, url: String,
      branch: String, paths: Seq[String], storePath: String,
      createdAt: Timestamp): Either[String, Long] =
    Security.validateGitHubRepoUrl(url).map { case (owner, repo) =>
      fetcher.fetchRepoFiles(owner, repo, branch, paths)
        .filter { case (p, _) => graft.chunk.FileTypes.isTextFile(p) }
        .map { case (p, content) =>
          IndexPipeline.indexText(spark, content, s"$owner/$repo/$p",
            storePath, createdAt).chunks
        }.sum
    }
}
