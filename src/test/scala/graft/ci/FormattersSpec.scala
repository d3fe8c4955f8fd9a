package graft
package ci

import org.scalatest.funsuite.AnyFunSuite

import graft.ci.Formatters.Impact

class FormattersSpec extends AnyFunSuite {

  private val impacts = Seq(
    Impact("src9", 42L, 0.91, "table,scan"),
    Impact("src2", 7L, 0.55, "fast"),
    Impact("src5", 3L, 0.12, "scan"))

  test("D6 markdown groups by severity band, highest first") {
    val md = Formatters.toMarkdown(impacts)
    val hi = md.indexOf("high")
    val me = md.indexOf("medium")
    val lo = md.indexOf("low")
    assert(hi >= 0 && me > hi && lo > me)
    assert(md.contains("`src9` doc 42"))
    // threshold filter drops low-band rows
    val filtered = Formatters.toMarkdown(impacts, threshold = 0.5)
    assert(!filtered.contains("src5"))
    // empty case
    assert(Formatters.toMarkdown(Nil).contains("No affected documents"))
  }

  test("X14: GitHub URL builder with plain view and line anchors") {
    assert(Formatters.githubUrl("o", "r", "main", "docs/a.md", Some(3), Some(9))
      === "https://github.com/o/r/blob/main/docs/a.md?plain=1#L3-L9")
    assert(Formatters.githubUrl("o", "r", "main", "docs/a.md", Some(3))
      === "https://github.com/o/r/blob/main/docs/a.md?plain=1#L3")
    assert(Formatters.githubUrl("o", "r", "dev", "x.md")
      === "https://github.com/o/r/blob/dev/x.md?plain=1")
  }

  test("D6 json lines: one valid object per impact") {
    val lines = Formatters.toJsonLines(impacts).trim.split("\n")
    assert(lines.length === 3)
    assert(lines(0) ===
      """{"source":"src9","doc_id":42,"score":0.91,"matched_terms":["table","scan"]}""")
  }
}
