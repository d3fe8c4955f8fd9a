package graft
package ci

import org.scalatest.funsuite.AnyFunSuite

class DiffAnalyzerSpec extends AnyFunSuite {

  private val tsFile =
    """export async function loadIndex() {}
      |export class VectorStore {}
      |export interface SearchHit {}
      |export type ScoreFn = (a: number) => number
      |const rankHits = (xs) => xs
      |""".stripMargin

  test("D2: symbol extraction per language family") {
    val ts = DiffAnalyzer.extractSymbols(tsFile, "src/store.ts")
    assert(ts.toSet === Set("loadIndex", "VectorStore", "SearchHit", "ScoreFn", "rankHits"))
    val py = DiffAnalyzer.extractSymbols(
      "class Indexer:\n  pass\ndef chunk_text(t):\n  pass\n", "a/b.py")
    assert(py.toSet === Set("Indexer", "chunk_text"))
    val rs = DiffAnalyzer.extractSymbols(
      "pub fn scan() {}\npub struct Reader {}\nimpl Reader {}\n", "x.rs")
    assert(rs.toSet === Set("scan", "Reader"))
  }

  test("X10: identifier splitting for camel/snake/kebab") {
    assert(DiffAnalyzer.splitIdentifier("loadVectorIndex") === Seq("load", "vector", "index"))
    assert(DiffAnalyzer.splitIdentifier("chunk_text_v2") === Seq("chunk", "text", "v2"))
    assert(DiffAnalyzer.splitIdentifier("doc-service") === Seq("doc", "service"))
  }

  test("D1+D3: name-status parse and capped query generation") {
    val changes = DiffAnalyzer.parseNameStatus(
      "M\tsrc/vector-store.ts\nA\tsrc/newFile.py\nD\tgone.md\nR100\told.ts\tsrc/renamed.ts",
      p => if (p.endsWith(".ts")) tsFile else "def chunk_text(t): return t")
    assert(changes.map(_.changeType) === Seq("modified", "added", "deleted", "renamed"))
    assert(changes.find(_.changeType == "deleted").get.content === "")
    assert(changes.last.path === "src/renamed.ts")

    val qs = DiffAnalyzer.generateSearchQueries(changes)
    assert(qs.nonEmpty && qs.length <= 30)
    assert(qs.contains("vector-store"))
    assert(qs.contains("vector store"))     // path words
    assert(qs.contains("VectorStore"))      // symbol
    assert(qs.contains("load index"))       // split symbol
    assert(qs.distinct.length === qs.length)
    // cap respected
    val many = (1 to 50).map(i => DiffAnalyzer.Change(s"f$i.ts", "modified", tsFile))
    assert(DiffAnalyzer.generateSearchQueries(many).length === 30)
  }
}
