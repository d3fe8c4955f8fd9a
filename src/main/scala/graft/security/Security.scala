package graft.security

import java.net.URI
import java.nio.file.{Path, Paths}

/** Input validation (reference X13, `src/core/security/security.ts:
  * 49-330`): path-traversal guards for local indexing, and URL
  * validation for the gist/GitHub sources. Driver-side pure Scala —
  * these run before any job is submitted.
  */
object Security {

  /** A candidate file must resolve inside `base` (no `..` escapes, no
    * null bytes, no symlinks pointing outside). Both base and candidate
    * are resolved with `toRealPath` — a symlink under base that targets
    * a path outside it must fail the containment check, exactly as the
    * reference realpath()s both sides (security.ts:49-183). Paths that
    * don't exist yet fall back to their normalized form (realpath of
    * the deepest existing ancestor + the remaining segments).
    * Returns the resolved absolute path. */
  def validateFilePath(base: String, candidate: String): Either[String, Path] = {
    if (candidate.indexOf(0.toChar) >= 0) return Left("null byte in path")
    val b = realOrNormalized(Paths.get(base).toAbsolutePath.normalize)
    val p = realOrNormalized(b.resolve(candidate).normalize)
    if (!p.startsWith(b)) Left(s"path escapes base: $candidate")
    else Right(p)
  }

  /** `toRealPath` resolving symlinks; for not-yet-existing paths,
    * realpath the deepest existing ancestor and re-append the rest so a
    * dangling tail can't hide an escape through an existing symlink. */
  private def realOrNormalized(p: Path): Path = {
    try p.toRealPath()
    catch {
      case _: java.io.IOException =>
        val parent = p.getParent
        if (parent == null) p
        else realOrNormalized(parent).resolve(p.getFileName).normalize
    }
  }

  private val GistIdRe = "^[0-9a-f]{20,64}$".r
  private val OwnerRepoRe = "^[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?$".r

  /** gist.github.com/{owner}/{gistId} with a hex id. */
  def validateGistUrl(url: String): Either[String, String] = parseHttps(url) {
    u =>
      if (u.getHost != "gist.github.com") Left(s"host not allowed: ${u.getHost}")
      else u.getPath.stripPrefix("/").split("/").filter(_.nonEmpty) match {
        case Array(_, id) if GistIdRe.matches(id) => Right(id)
        case Array(id) if GistIdRe.matches(id)    => Right(id)
        case _ => Left("not a gist path")
      }
  }

  /** github.com/{owner}/{repo}. */
  def validateGitHubRepoUrl(url: String): Either[String, (String, String)] =
    parseHttps(url) { u =>
      if (u.getHost != "github.com") Left(s"host not allowed: ${u.getHost}")
      else u.getPath.stripPrefix("/").split("/").filter(_.nonEmpty) match {
        case Array(owner, repoRaw) =>
          val repo = repoRaw.stripSuffix(".git")
          if (OwnerRepoRe.matches(owner) && OwnerRepoRe.matches(repo))
            Right((owner, repo))
          else Left("invalid owner/repo characters")
        case _ => Left("not an owner/repo path")
      }
    }

  private def parseHttps[A](url: String)(f: URI => Either[String, A]): Either[String, A] =
    try {
      val u = new URI(url)
      if (u.getScheme != "https") Left("only https URLs are allowed")
      else if (u.getUserInfo != null) Left("userinfo not allowed")
      else f(u)
    } catch { case e: Exception => Left(s"malformed URL: ${e.getMessage}") }
}
