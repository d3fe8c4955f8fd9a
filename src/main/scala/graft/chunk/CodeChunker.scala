package graft.chunk

import scala.collection.mutable.ArrayBuffer

import graft.model.{Boundary, ChunkPiece}

/** Regex code boundary chunker (reference C3:
  * `src/core/chunk/boundary-aware-chunking.ts:298-603`), also the
  * documented fallback for CST chunking (`cst-operations.ts:148-190`).
  *
  * Boundary rules (matched to the reference):
  *   - consecutive `import` / `from … import` lines (plus interior blank
  *     lines) form one `imports` section
  *   - JS/TS `function`, Python `def` → `function` sections named from
  *     the declaration; `class` → `class`; TypeScript additionally
  *     `interface` and `type`
  *   - anything else accumulates into `statement` sections
  *   - oversized sections size-split exactly like markdown sections
  */
object CodeChunker {

  private val ImportRe = """^import\s+.*""".r
  private val FromImportRe = """^from\s+.+\s+import.*""".r
  private val FunctionRes = Seq(
    """^(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s+(\w+).*""".r,
    """^(?:async\s+)?function\s+(\w+).*""".r,
    """^def\s+(\w+).*""".r,
    """^async\s+def\s+(\w+).*""".r)
  private val ClassRe = """^(?:export\s+)?(?:default\s+)?class\s+(\w+).*""".r
  private val InterfaceRe = """^(?:export\s+)?interface\s+(\w+).*""".r
  private val TypeRe = """^(?:export\s+)?type\s+(\w+).*""".r

  def chunk(text: String, language: String, maxSize: Int, overlap: Int): Seq[ChunkPiece] = {
    val sections = parseBoundaries(text, language)
      .flatMap(SectionSplitter.split(_, maxSize, overlap))
    SectionSplitter.toPieces(text, sections)
  }

  private[chunk] def parseBoundaries(text: String, language: String): Seq[Section] = {
    val out = ArrayBuffer.empty[Section]
    var lines: ArrayBuffer[String] = null
    var start = 0
    var kind: String = null
    var name: Option[String] = None
    var inImports = false

    def close(endOffset: Int): Unit = if (lines != null) {
      out += Section(lines.mkString("\n"), start, endOffset,
        Boundary(kind, name = name))
      lines = null; kind = null; name = None
    }
    def open(line: String, offset: Int, k: String, n: Option[String] = None): Unit = {
      lines = ArrayBuffer(line); start = offset; kind = k; name = n
    }
    def declName(line: String): Option[String] = {
      val m = """(?:function|def|class|interface|type)\s+(\w+)""".r
        .findFirstMatchIn(line)
      m.map(_.group(1))
    }

    var offset = 0
    for (line <- text.split("\n", -1)) {
      val nextOffset = offset + line.length + 1
      val isImport = ImportRe.matches(line) || FromImportRe.matches(line)
      if (isImport) {
        if (!inImports) {
          close(offset - 1)
          inImports = true
          open(line, offset, "imports")
        } else lines += line
      } else if (inImports && line.trim.isEmpty) {
        lines += line
      } else {
        if (inImports) { close(offset - 1); inImports = false }
        val isFunction = FunctionRes.exists(_.matches(line))
        val isClass = ClassRe.matches(line)
        val isInterface = language == "typescript" && InterfaceRe.matches(line)
        val isType = language == "typescript" && TypeRe.matches(line)
        if (isFunction || isClass || isInterface || isType) {
          close(offset - 1)
          val k = if (isFunction) "function"
            else if (isClass) "class"
            else if (isInterface) "interface"
            else "type"
          open(line, offset, k, declName(line))
        } else if (lines == null) {
          open(line, offset, "statement")
        } else {
          lines += line
        }
      }
      offset = nextOffset
    }
    close(offset - 1)
    out.toSeq
  }
}
