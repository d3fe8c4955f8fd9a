package graft
package security

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class SecuritySpec extends AnyFunSuite {

  test("X13: symlink escaping the base is rejected (realpath containment)") {
    val outside = Files.createTempDirectory("graft_sec_outside")
    val base = Files.createTempDirectory("graft_sec_base")
    val secret = Files.writeString(outside.resolve("secret.txt"), "s")
    // symlink inside base → file outside base: normalization alone
    // can't see this; only realpath resolution does (ADVICE r2)
    Files.createSymbolicLink(base.resolve("link.txt"), secret)
    assert(Security.validateFilePath(base.toString, "link.txt").isLeft)
    // symlinked DIRECTORY under base → outside; a dangling child of it
    // must also fail (deepest-existing-ancestor realpath)
    Files.createSymbolicLink(base.resolve("dir"), outside)
    assert(Security.validateFilePath(base.toString, "dir/anything.txt").isLeft)
    // a legit symlink pointing INSIDE base still passes
    val real = Files.writeString(base.resolve("real.txt"), "r")
    Files.createSymbolicLink(base.resolve("ok.txt"), real)
    assert(Security.validateFilePath(base.toString, "ok.txt").isRight)
    // not-yet-existing plain candidate under base still passes
    assert(Security.validateFilePath(base.toString, "new/file.txt").isRight)
  }

  test("X13: path traversal is rejected, clean paths resolve") {
    assert(Security.validateFilePath("/data/docs", "a/b.md").isRight)
    assert(Security.validateFilePath("/data/docs", "../etc/passwd").isLeft)
    assert(Security.validateFilePath("/data/docs", "a/../../../etc").isLeft)
    assert(Security.validateFilePath("/data/docs", "a/\u0000b").isLeft)
  }

  test("X13: gist URL validation") {
    val id = "a" * 32
    assert(Security.validateGistUrl(s"https://gist.github.com/user/$id") === Right(id))
    assert(Security.validateGistUrl(s"https://gist.github.com/$id") === Right(id))
    assert(Security.validateGistUrl(s"http://gist.github.com/user/$id").isLeft)
    assert(Security.validateGistUrl(s"https://evil.com/user/$id").isLeft)
    assert(Security.validateGistUrl("https://gist.github.com/user/not-hex").isLeft)
  }

  test("X13: github repo URL validation") {
    assert(Security.validateGitHubRepoUrl("https://github.com/foo/bar")
      === Right(("foo", "bar")))
    assert(Security.validateGitHubRepoUrl("https://github.com/foo/bar.git")
      === Right(("foo", "bar")))
    assert(Security.validateGitHubRepoUrl("https://github.com/foo").isLeft)
    assert(Security.validateGitHubRepoUrl("https://github.com/-bad/x").isLeft)
    assert(Security.validateGitHubRepoUrl("https://user:pw@github.com/foo/bar").isLeft)
  }
}
