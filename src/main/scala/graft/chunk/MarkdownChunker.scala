package graft.chunk

import scala.collection.mutable.ArrayBuffer

import graft.model.{Boundary, ChunkPiece}

/** Markdown boundary-aware chunker (reference C2:
  * `src/core/chunk/boundary-aware-chunking.ts:27-293`).
  *
  * Section rules (matched to the reference):
  *   - fenced code blocks (``` … ```) are standalone `code` sections,
  *     closing any open section; an unclosed fence at EOF is dropped
  *   - h1/h2 open a new `heading` section that absorbs everything until
  *     the next h1/h2 or fence; h3-h6 merge into the open section (or
  *     open one if none)
  *   - runs of list items (`- * +` or `1.`) outside headings form `list`
  *     sections; other text forms `paragraph` sections
  *   - oversized sections are size-split line-wise with line-granular
  *     overlap (see [[SectionSplitter]])
  */
object MarkdownChunker {

  private val HeadingRe = """^(#{1,6})\s+(.+)$""".r
  private val ListRe = """^\s*(?:[-*+]|\d+\.)\s+.*""".r

  def chunk(text: String, maxSize: Int, overlap: Int): Seq[ChunkPiece] = {
    val sections = parseSections(text)
      .flatMap(SectionSplitter.split(_, maxSize, overlap))
    SectionSplitter.toPieces(text, sections)
  }

  private[chunk] def parseSections(text: String): Seq[Section] = {
    val out = ArrayBuffer.empty[Section]
    // open non-code section state
    var lines: ArrayBuffer[String] = null
    var start = 0
    var kind: String = null
    var level: Option[Int] = None
    var title: Option[String] = None

    def close(endOffset: Int): Unit = if (lines != null) {
      out += Section(lines.mkString("\n"), start, endOffset,
        Boundary(kind, level = level, title = title))
      lines = null; kind = null; level = None; title = None
    }
    def open(line: String, offset: Int, k: String,
        lvl: Option[Int] = None, ttl: Option[String] = None): Unit = {
      lines = ArrayBuffer(line); start = offset; kind = k
      level = lvl; title = ttl
    }

    var inCode = false
    var codeStart = 0
    var codeLines: ArrayBuffer[String] = null
    var offset = 0

    for (line <- text.split("\n", -1)) {
      val nextOffset = offset + line.length + 1
      if (line.startsWith("```")) {
        if (!inCode) {
          close(offset - 1)
          inCode = true; codeStart = offset; codeLines = ArrayBuffer(line)
        } else {
          codeLines += line
          out += Section(codeLines.mkString("\n"), codeStart,
            nextOffset - 1, Boundary("code"))
          inCode = false; codeLines = null
        }
      } else if (inCode) {
        codeLines += line
      } else line match {
        case HeadingRe(hashes, ttl) =>
          val lvl = hashes.length
          if (lvl <= 2) {
            close(offset - 1)
            open(line, offset, "heading", Some(lvl), Some(ttl))
          } else if (lines != null) {
            lines += line
          } else {
            open(line, offset, "heading", Some(lvl), Some(ttl))
          }
        case _ if kind == "heading" =>
          lines += line
        case ListRe() =>
          if (kind != "list") {
            close(offset - 1)
            open(line, offset, "list")
          } else lines += line
        case _ if line.trim.isEmpty =>
          if (lines != null) lines += line
        case _ =>
          // a plain line ends an open list block but merges into an
          // open paragraph/heading section
          if (lines == null || kind == "list") {
            close(offset - 1)
            open(line, offset, "paragraph")
          } else lines += line
      }
      offset = nextOffset
    }
    close(offset - 1)
    out.toSeq
  }
}
