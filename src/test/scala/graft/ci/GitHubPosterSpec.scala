package graft
package ci

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** D7: GitHub PR posting behind the injectable [[GitHubPoster]] seam
  * (reference `src/core/ci/github-integration.ts`). A recording fake
  * proves context detection, the validation error ladder, and the
  * upsert-not-duplicate comment behavior across repeated CI runs.
  */
class GitHubPosterSpec extends AnyFunSuite {

  /** In-memory poster: records every call, assigns comment ids. */
  private class RecordingPoster extends GitHubPoster {
    val comments = mutable.LinkedHashMap.empty[Long, String]
    val calls = mutable.ArrayBuffer.empty[String]
    private var nextId = 100L
    def listComments(owner: String, repo: String, prNumber: Int) = {
      calls += s"list:$owner/$repo#$prNumber"
      comments.toSeq
    }
    def createComment(owner: String, repo: String, prNumber: Int, body: String) = {
      calls += s"create:$owner/$repo#$prNumber"
      nextId += 1; comments(nextId) = body; nextId
    }
    def updateComment(owner: String, repo: String, commentId: Long, body: String) = {
      calls += s"update:$owner/$repo@$commentId"
      comments(commentId) = body
    }
  }

  private val prEnv = Map(
    "GITHUB_ACTIONS" -> "true",
    "GITHUB_EVENT_NAME" -> "pull_request",
    "GITHUB_REF" -> "refs/pull/123/merge",
    "GITHUB_BASE_REF" -> "main",
    "GITHUB_REPOSITORY" -> "octo/engine",
    "GITHUB_TOKEN" -> "t0k3n")

  test("context detection parses the GitHub Actions env contract") {
    val ctx = GitHubIntegration.detectContext(prEnv)
    assert(ctx.isPR)
    assert(ctx.prNumber === Some(123))
    assert(ctx.baseBranch === Some("main"))
    assert(ctx.owner === Some("octo") && ctx.repo === Some("engine"))
    assert(ctx.token === Some("t0k3n"))
    // pull_request_target also counts as a PR event
    assert(GitHubIntegration
      .detectContext(prEnv + ("GITHUB_EVENT_NAME" -> "pull_request_target")).isPR)
    // outside Actions the context is inert regardless of other vars
    assert(!GitHubIntegration.detectContext(prEnv - "GITHUB_ACTIONS").isPR)
    // push event is not a PR context
    assert(!GitHubIntegration
      .detectContext(prEnv + ("GITHUB_EVENT_NAME" -> "push")).isPR)
  }

  test("validation error ladder matches the reference order") {
    val p = new RecordingPoster
    assert(GitHubIntegration.postToPR(p, Map.empty, "x")
      === Left("Not running in a GitHub PR context"))
    assert(GitHubIntegration.postToPR(p,
      prEnv + ("GITHUB_REF" -> "refs/heads/main"), "x")
      === Left("Could not determine PR number"))
    assert(GitHubIntegration.postToPR(p, prEnv - "GITHUB_REPOSITORY", "x")
      === Left("Could not determine repository info"))
    assert(GitHubIntegration.postToPR(p, prEnv - "GITHUB_TOKEN", "x")
      === Left("GITHUB_TOKEN is not set"))
    assert(p.calls.isEmpty, "no transport call may happen before validation")
  }

  test("postToPR creates one comment per call (reference parity)") {
    val p = new RecordingPoster
    val id = GitHubIntegration.postToPR(p, prEnv, "report v1")
    assert(id.isRight)
    GitHubIntegration.postToPR(p, prEnv, "report v2")
    assert(p.comments.size === 2)
  }

  test("upsertToPR updates its marked comment instead of duplicating") {
    val p = new RecordingPoster
    // an unrelated human comment must never be touched
    p.createComment("octo", "engine", 123, "LGTM from a human")
    p.calls.clear()

    val first = GitHubIntegration.upsertToPR(p, prEnv, "impact: 3 docs")
    val second = GitHubIntegration.upsertToPR(p, prEnv, "impact: 1 doc")
    assert(first === second, "both runs resolve to the same comment id")
    assert(p.comments.size === 2, "human comment + exactly one bot comment")
    val botBody = p.comments(first.toOption.get)
    assert(botBody.startsWith("impact: 1 doc"), "second run replaced the body")
    assert(botBody.contains(GitHubIntegration.Marker))
    assert(p.comments.values.head === "LGTM from a human")
    assert(p.calls.count(_.startsWith("create:")) === 1)
    assert(p.calls.count(_.startsWith("update:")) === 1)
  }

  test("upsert composes with the D6 formatter output") {
    val p = new RecordingPoster
    val md = Formatters.toMarkdown(Seq(
      Formatters.Impact("docs/a.md", 42L, 0.91, "table,scan")))
    val id = GitHubIntegration.upsertToPR(p, prEnv, md)
    assert(p.comments(id.toOption.get).contains("`docs/a.md` doc 42"))
  }
}
