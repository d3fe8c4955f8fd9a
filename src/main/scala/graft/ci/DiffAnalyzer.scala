package graft.ci

import scala.util.matching.Regex

/** Diff → search-query analysis (reference D1-D3,
  * `src/core/ci/diff-analyzer.ts:26-533`): parse a `git diff
  * --name-status` listing, extract declared symbols with per-language
  * regex families, split identifiers (camel/snake/kebab — X10), and
  * generate a deduplicated, capped query list.
  *
  * All driver-side pure Scala: the git subprocess output and file
  * contents are injected, so this is testable without git and the
  * downstream search fan-out runs as ONE Spark job (see
  * [[graft.operators.Ci.qDocImpact]]) instead of the reference's ≤30
  * sequential searches.
  */
object DiffAnalyzer {

  case class Change(path: String, changeType: String, content: String)

  /** D1: parse `git diff --name-status` lines (A/M/D/Rnnn). */
  def parseNameStatus(listing: String,
      contentOf: String => String): Seq[Change] =
    listing.linesIterator.flatMap { line =>
      line.split("\t").toList match {
        case status :: path :: rest =>
          val p = rest.lastOption.getOrElse(path) // renames: new path
          val t = status.head match {
            case 'A' => "added"
            case 'D' => "deleted"
            case 'R' => "renamed"
            case _   => "modified"
          }
          val content = if (t == "deleted") "" else contentOf(p)
          Some(Change(p, t, content.take(2000))) // reference caps at 2000
        case _ => None
      }
    }.toSeq

  private val symbolRes: Map[String, Seq[Regex]] = {
    val jsTs = Seq(
      """(?m)^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s+(\w+)""".r,
      """(?m)^\s*(?:export\s+)?(?:default\s+)?class\s+(\w+)""".r,
      """(?m)^\s*(?:export\s+)?interface\s+(\w+)""".r,
      """(?m)^\s*(?:export\s+)?type\s+(\w+)\s*=""".r,
      """(?m)^\s*(?:export\s+)?const\s+(\w+)\s*=\s*(?:async\s*)?\(""".r)
    val py = Seq(
      """(?m)^\s*(?:async\s+)?def\s+(\w+)""".r,
      """(?m)^\s*class\s+(\w+)""".r)
    val go = Seq(
      """(?m)^func\s+(?:\([^)]*\)\s*)?(\w+)""".r,
      """(?m)^type\s+(\w+)\s+(?:struct|interface)""".r)
    val rust = Seq(
      """(?m)^\s*(?:pub\s+)?fn\s+(\w+)""".r,
      """(?m)^\s*(?:pub\s+)?(?:struct|enum|trait)\s+(\w+)""".r,
      """(?m)^\s*impl(?:<[^>]*>)?\s+(\w+)""".r)
    val jvm = Seq(
      """(?m)^\s*(?:public|private|protected)?\s*(?:static\s+)?(?:final\s+)?class\s+(\w+)""".r,
      """(?m)^\s*(?:def|val|var)\s+(\w+)""".r)
    Map(
      ".js" -> jsTs, ".jsx" -> jsTs, ".ts" -> jsTs, ".tsx" -> jsTs,
      ".mjs" -> jsTs, ".py" -> py, ".go" -> go, ".rs" -> rust,
      ".java" -> jvm, ".scala" -> jvm)
  }

  /** D2 (regex family — the reference's own fallback when CST parsing
    * fails): declared symbol names for the file's language. */
  def extractSymbols(content: String, path: String): Seq[String] = {
    val ext = graft.chunk.FileTypes.extensionOf(path)
    symbolRes.getOrElse(ext, symbolRes(".ts"))
      .flatMap(_.findAllMatchIn(content).map(_.group(1)))
      .distinct
  }

  /** X10: camelCase / snake_case / kebab-case → lowercase words. */
  def splitIdentifier(s: String): Seq[String] =
    s.replaceAll("([a-z0-9])([A-Z])", "$1 $2")
      .replaceAll("[_\\-./]+", " ")
      .toLowerCase.split("\\s+").filter(_.length > 1).toSeq

  /** D3: queries from changes — path words, symbols + case variants,
    * 2- and 3-word content phrases, deduped, capped (default 30). */
  def generateSearchQueries(changes: Seq[Change], cap: Int = 30): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    for (c <- changes) {
      val base = c.path.substring(c.path.lastIndexOf('/') + 1)
        .replaceAll("\\.\\w+$", "")
      out += base
      val pathWords = splitIdentifier(base)
      if (pathWords.length > 1) out += pathWords.mkString(" ")
      for (sym <- extractSymbols(c.content, c.path)) {
        out += sym
        val words = splitIdentifier(sym)
        if (words.length > 1) out += words.mkString(" ")
      }
      val words = c.content.toLowerCase
        .split("[^a-z0-9]+").filter(_.length > 3)
      words.sliding(2).take(5).foreach(w => if (w.length == 2) out += w.mkString(" "))
      words.sliding(3).take(3).foreach(w => if (w.length == 3) out += w.mkString(" "))
    }
    out.take(cap).toSeq
  }
}
