package graft
package security

import org.scalatest.funsuite.AnyFunSuite

class SecuritySpec extends AnyFunSuite {

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
