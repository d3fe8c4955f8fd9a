package graft.ci

/** D7: GitHub PR comment posting (reference
  * `src/core/ci/github-integration.ts:15-60` context detection,
  * `:58-97` posting). The HTTP/CLI transport is a seam behind
  * [[GitHubPoster]], exactly like [[graft.sources.RemoteFetcher]] for
  * S4/S5 — tests inject a recording fake; production wires a `gh`
  * subprocess or REST client.
  *
  * Semantics:
  *   - [[GitHubIntegration.detectContext]] reads the GitHub-Actions
  *     environment contract (GITHUB_ACTIONS, GITHUB_EVENT_NAME,
  *     GITHUB_REF `pull/<n>`, GITHUB_BASE_REF, GITHUB_REPOSITORY
  *     `owner/repo`, GITHUB_TOKEN) into a typed context.
  *   - [[GitHubIntegration.postToPR]] validates the context with the
  *     reference's exact error ladder (not-a-PR → no PR number → no
  *     repo info → no token) before calling the poster.
  *   - [[GitHubIntegration.upsertToPR]] is the CI-friendly variant:
  *     a hidden HTML marker identifies the bot's prior comment and the
  *     post UPDATES it instead of stacking a new comment per push —
  *     the upsert-not-duplicate behavior a recurring doc-impact job
  *     needs (the reference's shipped path re-creates; marker upsert
  *     is the standard sticky-comment refinement of it).
  */
trait GitHubPoster extends Serializable {
  /** Existing comments on the PR as (commentId, body), oldest first. */
  def listComments(owner: String, repo: String, prNumber: Int): Seq[(Long, String)]
  /** Create a new comment; returns its id. */
  def createComment(owner: String, repo: String, prNumber: Int, body: String): Long
  /** Replace the body of an existing comment. */
  def updateComment(owner: String, repo: String, commentId: Long, body: String): Unit
}

final case class GitHubContext(
    isPR: Boolean,
    prNumber: Option[Int] = None,
    baseBranch: Option[String] = None,
    owner: Option[String] = None,
    repo: Option[String] = None,
    token: Option[String] = None)

object GitHubIntegration {

  /** Hidden marker appended to upserted comments so later runs find
    * their own comment among unrelated ones. */
  val Marker = "<!-- graft:doc-impact -->"

  private val PullRef = """.*pull/(\d+).*""".r

  /** Reference `detectGitHubContext` (`github-integration.ts:15-55`):
    * env is injected rather than read from `sys.env` so the contract
    * is testable and the caller controls the environment source. */
  def detectContext(env: Map[String, String]): GitHubContext = {
    if (!env.contains("GITHUB_ACTIONS")) return GitHubContext(isPR = false)
    val eventName = env.get("GITHUB_EVENT_NAME")
    val isPR = eventName.contains("pull_request") ||
      eventName.contains("pull_request_target")
    val prNumber =
      if (isPR) env.get("GITHUB_REF").collect { case PullRef(n) => n.toInt }
      else None
    val baseBranch = if (isPR) env.get("GITHUB_BASE_REF") else None
    val (owner, repo) = env.get("GITHUB_REPOSITORY").map(_.split("/", 2)) match {
      case Some(Array(o, r)) => (Some(o), Some(r))
      case _                 => (None, None)
    }
    GitHubContext(isPR, prNumber, baseBranch, owner, repo,
      env.get("GITHUB_TOKEN"))
  }

  /** Reference `postToGitHubPR` error ladder, then one create call. */
  def postToPR(poster: GitHubPoster, env: Map[String, String],
      content: String): Either[String, Long] =
    validated(env).map { case (owner, repo, pr) =>
      poster.createComment(owner, repo, pr, content)
    }

  /** Update the marker-tagged comment if one exists, else create it.
    * Never stacks duplicates across runs. */
  def upsertToPR(poster: GitHubPoster, env: Map[String, String],
      content: String): Either[String, Long] =
    validated(env).map { case (owner, repo, pr) =>
      val body = s"$content\n$Marker"
      poster.listComments(owner, repo, pr)
        .find { case (_, b) => b.contains(Marker) } match {
        case Some((id, _)) => poster.updateComment(owner, repo, id, body); id
        case None          => poster.createComment(owner, repo, pr, body)
      }
    }

  private def validated(
      env: Map[String, String]): Either[String, (String, String, Int)] = {
    val ctx = detectContext(env)
    if (!ctx.isPR) Left("Not running in a GitHub PR context")
    else if (ctx.prNumber.isEmpty) Left("Could not determine PR number")
    else if (ctx.owner.isEmpty || ctx.repo.isEmpty)
      Left("Could not determine repository info")
    else if (ctx.token.isEmpty)
      Left("GITHUB_TOKEN is not set")
    else Right((ctx.owner.get, ctx.repo.get, ctx.prNumber.get))
  }
}
