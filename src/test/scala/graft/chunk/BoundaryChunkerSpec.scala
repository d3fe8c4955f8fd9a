package graft.chunk

import org.scalatest.funsuite.AnyFunSuite

/** C2 markdown + C3 code boundary chunkers (reference
  * src/core/chunk/boundary-aware-chunking.ts) and the C5/C6
  * settings/dispatch layer.
  */
class BoundaryChunkerSpec extends AnyFunSuite {

  test("markdown: h1/h2 open sections, h3+ merge, fences are standalone") {
    val md =
      """# Title
        |intro text
        |## Section A
        |body a
        |### sub
        |more a
        |```scala
        |val x = 1
        |```
        |- item 1
        |- item 2
        |plain paragraph""".stripMargin
    val sections = MarkdownChunker.parseSections(md)
    val kinds = sections.map(_.boundary.boundaryType)
    assert(kinds == Seq("heading", "heading", "code", "list", "paragraph"))
    assert(sections(0).boundary.title.contains("Title"))
    assert(sections(1).boundary.title.contains("Section A"))
    assert(sections(1).content.contains("### sub"))
    assert(sections(2).content.startsWith("```scala"))
  }

  test("markdown: offsets point into the original text") {
    val md = "# A\nbody\n\n# B\nmore"
    val sections = MarkdownChunker.parseSections(md)
    sections.foreach { s =>
      assert(md.substring(s.startOffset,
        math.min(s.endOffset, md.length)).startsWith(s.content.take(3)))
    }
  }

  test("code: imports group, functions and classes split with names") {
    val code =
      """import a.b
        |import c.d
        |
        |def foo(x: Int) = x
        |val helper = 1
        |class Bar {
        |  def inner = 2
        |}""".stripMargin
    val sections = CodeChunker.parseBoundaries(code, "python")
    val kinds = sections.map(s => (s.boundary.boundaryType, s.boundary.name))
    assert(kinds.head == ("imports", None))
    assert(kinds.exists(_ == ("function", Some("foo"))))
    assert(kinds.exists(_ == ("class", Some("Bar"))))
  }

  test("code: typescript interface/type are boundaries only for typescript") {
    val code = "interface Foo {\n  a: string\n}\ntype Bar = Foo"
    val ts = CodeChunker.parseBoundaries(code, "typescript")
    assert(ts.map(_.boundary.boundaryType) == Seq("interface", "type"))
    val js = CodeChunker.parseBoundaries(code, "javascript")
    assert(js.map(_.boundary.boundaryType) == Seq("statement"))
  }

  test("oversized sections size-split with line-granular overlap") {
    val lines = (1 to 40).map(i => f"line-$i%02d").mkString("\n")
    val section = Section(lines, 0, lines.length,
      graft.model.Boundary("paragraph"))
    val parts = SectionSplitter.split(section, maxSize = 80, overlap = 16)
    assert(parts.length > 1)
    parts.foreach(p => assert(p.content.length <= 80 + 8))
    // consecutive pieces share their overlap tail/head
    parts.sliding(2).foreach { case Seq(a, b) =>
      val tail = a.content.split("\n").last
      assert(b.content.split("\n").contains(tail))
    case _ => ()
    }
    // every original line is present in some piece
    val covered = parts.flatMap(_.content.split("\n")).toSet
    assert((1 to 40).forall(i => covered.contains(f"line-$i%02d")))
  }

  test("dispatch: settings by extension, chunker selection") {
    assert(FileTypes.optimalSettings("a/b/x.ts") == FileTypes.CodeSettings)
    assert(FileTypes.optimalSettings("x.md") == FileTypes.DocumentationSettings)
    assert(FileTypes.optimalSettings("x.txt") == FileTypes.ArticleSettings)
    assert(FileTypes.optimalSettings("noext") == FileTypes.DefaultSettings)
    assert(FileTypes.isTextFile("src/x.py"))
    assert(!FileTypes.isTextFile("img.png"))

    val md = "# T\nbody"
    val viaMd = ChunkDispatch.chunk(md, Some("d.md"), 100, 20, preserveBoundaries = true)
    assert(viaMd.head.boundary.exists(_.boundaryType == "heading"))
    // every mapped language routes through the structural CST chunker
    // (C4) → tree-sitter node-type names; the regex chunker (C3)
    // remains the any-failure fallback
    val viaCst = ChunkDispatch.chunk("def f(): pass", Some("d.py"), 100, 20,
      preserveBoundaries = true)
    assert(viaCst.head.boundary.exists(_.boundaryType == "function_definition"))
    val viaJs = ChunkDispatch.chunk("function f() {}", Some("d.js"), 100, 20,
      preserveBoundaries = true)
    assert(viaJs.head.boundary.exists(_.boundaryType == "function_declaration"))
    // an unmapped code extension (C#) routes STRAIGHT to the regex
    // chunker — never through another language's CST rules — matching
    // the reference's isTreeSitterSupported gate. The fixture starts
    // lines with `class`/`function` on purpose: under the old
    // javascript-default CST routing these would have produced
    // JS-semantics boundary kinds.
    val viaCs = ChunkDispatch.chunk(
      "class A {\n  function X() { return 1; }\n}", Some("d.cs"),
      100, 20, preserveBoundaries = true)
    assert(viaCs.nonEmpty)
    val regexKinds = Set("imports", "function", "class", "interface",
      "type", "statement")
    assert(viaCs.flatMap(_.boundary).forall(b =>
      regexKinds.contains(b.boundaryType)),
      viaCs.flatMap(_.boundary).map(_.boundaryType))
    val plain = ChunkDispatch.chunk(md, Some("d.md"), 100, 20)
    assert(plain.head.boundary.isEmpty)
  }
}
