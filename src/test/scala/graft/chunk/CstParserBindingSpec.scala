package graft.chunk

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChunkPiece

/** A well-behaved test binding: delegates to the scanner (so routing
  * through it is observable yet semantics-preserving). Top-level with
  * a no-arg constructor — the reflective-load contract. */
class ScannerEchoBinding extends CstParserBinding {
  var calls = 0
  def parse(text: String, language: String): Option[Seq[ChunkPiece]] = {
    calls += 1
    Some(CstChunker.scannerChunk(text, language))
  }
}

/** The opt-in real-parser seam (r7 verdict item 6): routing, fallback
  * on abstention/failure, reflective load, and the env-gated parity
  * run against a genuine binding (canceled-not-failed offline). */
class CstParserBindingSpec extends AnyFunSuite {

  private val py =
    "import os\n\n@cache\ndef f():\n    return 1\n\nclass C:\n    def m(self):\n        return 2\n"

  test("no binding configured: chunk() is the scanner, byte-for-byte") {
    assert(CstParserBinding.active.isEmpty,
      "spec environment must not configure a real parser")
    assert(CstChunker.chunk(py, "python") ===
      CstChunker.scannerChunk(py, "python"))
  }

  test("a configured binding takes precedence and is actually invoked") {
    val b = new ScannerEchoBinding
    val out = CstChunker.chunkVia(Some(b), py, "python")
    assert(b.calls === 1)
    assert(out === CstChunker.scannerChunk(py, "python"))
  }

  test("binding abstention (None) and binding throw both fall back " +
      "to the scanner — the reference's any-failure fallback") {
    val abstain = new CstParserBinding {
      def parse(t: String, l: String): Option[Seq[ChunkPiece]] = None
    }
    val broken = new CstParserBinding {
      def parse(t: String, l: String): Option[Seq[ChunkPiece]] =
        throw new UnsatisfiedLinkError("libtree-sitter.so not found")
    }
    val want = CstChunker.scannerChunk(py, "python")
    assert(CstChunker.chunkVia(Some(abstain), py, "python") === want)
    assert(CstChunker.chunkVia(Some(broken), py, "python") === want)
  }

  test("reflective load: valid FQCN resolves, garbage never errors") {
    assert(CstParserBinding
      .load("graft.chunk.ScannerEchoBinding").isDefined)
    assert(CstParserBinding.load("no.such.Binding").isEmpty)
    assert(CstParserBinding.load("graft.chunk.CstChunker").isEmpty,
      "non-binding class must load as None, not ClassCastException")
  }

  test("real-parser parity on the scanner's fixture semantics " +
      "(opt-in: GRAFT_CST_PARSER; canceled offline)") {
    val fqcn = sys.env.get("GRAFT_CST_PARSER")
    assume(fqcn.isDefined,
      "no real CST parser configured (GRAFT_CST_PARSER unset) — " +
        "scanner-only environment, parity run skipped")
    val binding = CstParserBinding.load(fqcn.get)
    assert(binding.isDefined, s"GRAFT_CST_PARSER=${fqcn.get} failed to load")
    val samples = Seq(
      ("python", py),
      ("go", "package m\n\nfunc F() int {\n\treturn 1\n}\n"),
      ("typescript", "import { a } from 'b'\n\nfunction f() {\n  return 1\n}\n\nclass C {\n  m() { return 2 }\n}\n"))
    samples.foreach { case (lang, src) =>
      val real = binding.get.parse(src, lang)
      assume(real.isDefined, s"binding abstained on $lang")
      val scan = CstChunker.scannerChunk(src, lang)
      assert(real.get.map(p => (p.boundary.map(_.boundaryType), p.content)) ===
        scan.map(p => (p.boundary.map(_.boundaryType), p.content)),
        s"$lang: real parser and scanner disagree on boundary inventory")
    }
  }
}
