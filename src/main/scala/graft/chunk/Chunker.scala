package graft.chunk

import scala.collection.mutable.ArrayBuffer

import graft.model.{Boundary, ChunkPiece}

/** Fixed-size sliding-window chunker (reference C1:
  * `src/core/chunk/chunking.ts:42-108`).
  *
  * Semantics matched to the reference:
  *   - step = size − overlap; windows advance on the un-snapped grid
  *   - optional word-boundary snap: shrink `end` to the last space or
  *     newline at-or-before it, if that stays past the window start
  *   - emitted content is trimmed; all-whitespace windows are skipped and
  *     do not consume an index
  *   - text shorter than `size` yields exactly one untrimmed chunk
  */
object Chunker {

  val DefaultSize = 1000
  val DefaultOverlap = 200

  def chunk(
      text: String,
      size: Int = DefaultSize,
      overlap: Int = DefaultOverlap,
      preserveWords: Boolean = true): Seq[ChunkPiece] = {
    require(size > 0, "Chunk size must be greater than 0")
    require(overlap >= 0, "Overlap cannot be negative")
    require(overlap < size, "Overlap must be less than chunk size")

    if (text.length <= size)
      return Seq(ChunkPiece(text, 0, 0, text.length))

    val step = size - overlap
    val out = ArrayBuffer.empty[ChunkPiece]
    var index = 0
    var i = 0
    var done = false
    while (i < text.length && !done) {
      var end = math.min(i + size, text.length)
      if (preserveWords && end < text.length) {
        val break = math.max(text.lastIndexOf(' ', end), text.lastIndexOf('\n', end))
        if (break > i) end = break
      }
      val content = text.substring(i, end).trim
      if (content.nonEmpty) {
        out += ChunkPiece(content, index, i, end)
        index += 1
      }
      if (end >= text.length) done = true
      i += step
    }
    out.toSeq
  }

  /** Exact-window variant: no trim, no word snap, no empty-window
    * skipping — every chunk is precisely `text[start, end)`, so a
    * downstream consumer can reconstruct the original by concatenating
    * `content.substring(overlap)` of consecutive chunks (the
    * overlap-strip reassembly of reference Q3/W3, `search.ts:193-228`,
    * made lossless instead of heuristic). */
  def chunkRaw(text: String, size: Int, overlap: Int): Seq[ChunkPiece] = {
    require(size > 0 && overlap >= 0 && overlap < size)
    if (text.length <= size)
      return Seq(ChunkPiece(text, 0, 0, text.length))
    val step = size - overlap
    val out = ArrayBuffer.empty[ChunkPiece]
    var index = 0
    var i = 0
    var done = false
    while (i < text.length && !done) {
      val end = math.min(i + size, text.length)
      out += ChunkPiece(text.substring(i, end), index, i, end)
      index += 1
      if (end >= text.length) done = true
      i += step
    }
    out.toSeq
  }

  /** 1-based line numbers for a [start, end) offset range (reference
    * `src/core/chunk/line-utils.ts:4-20`). */
  def lineNumbers(text: String, start: Int, end: Int): (Int, Int) = {
    val startLine = 1 + countNewlines(text, 0, start)
    val endLine = startLine + countNewlines(text, start, end)
    (startLine, endLine)
  }

  private def countNewlines(text: String, from: Int, until: Int): Int = {
    var n = 0
    var i = from
    while (i < until && i < text.length) {
      if (text.charAt(i) == '\n') n += 1
      i += 1
    }
    n
  }
}

/** A contiguous run of lines with one semantic boundary, produced by the
  * markdown / code section parsers before size-splitting. */
private[chunk] case class Section(
    content: String,
    startOffset: Int,
    endOffset: Int,
    boundary: Boundary)

/** Shared size-splitter for boundary-aware chunkers (the reference
  * duplicates this logic in `boundary-aware-chunking.ts:206-293` and
  * `:518-603`; here it is one function).
  *
  * Splits an oversized section line-by-line, carrying a tail of whole
  * lines as overlap into the next piece. Divergence from the reference
  * (documented per SURVEY.md §7.4): the reference adds the first
  * *rejected* overlap line's length to its offset arithmetic, producing
  * start offsets that disagree with the emitted content; we count only
  * accepted lines.
  */
private[chunk] object SectionSplitter {

  def split(section: Section, maxSize: Int, overlap: Int): Seq[Section] = {
    if (section.content.length <= maxSize) return Seq(section)

    val lines = section.content.split("\n", -1)
    val out = ArrayBuffer.empty[Section]
    var current = ArrayBuffer.empty[String]
    var currentSize = 0
    var chunkStart = section.startOffset

    for (line <- lines) {
      val lineSize = line.length + 1
      if (currentSize + lineSize > maxSize && current.nonEmpty) {
        out += Section(current.mkString("\n"), chunkStart,
          chunkStart + currentSize - 1, section.boundary)
        // carry trailing whole lines while they fit in `overlap`;
        // empty lines are skipped without terminating the scan
        // (matches the reference's falsy-string check)
        val tail = ArrayBuffer.empty[String]
        var tailSize = 0
        var j = current.length - 1
        var stop = false
        while (j >= 0 && !stop) {
          val l = current(j)
          if (l.nonEmpty) {
            if (tailSize + l.length + 1 <= overlap) {
              tailSize += l.length + 1
              l +=: tail
            } else stop = true
          }
          j -= 1
        }
        chunkStart = chunkStart + currentSize - tailSize
        current = tail :+ line
        currentSize = tailSize + lineSize
      } else {
        current += line
        currentSize += lineSize
      }
    }
    if (current.nonEmpty)
      out += Section(current.mkString("\n"), chunkStart,
        section.endOffset, section.boundary)
    out.toSeq
  }

  /** Attach indexes + line numbers to finished sections. */
  def toPieces(text: String, sections: Seq[Section]): Seq[ChunkPiece] =
    sections.zipWithIndex.map { case (s, i) =>
      val (startLine, endLine) = Chunker.lineNumbers(text, s.startOffset, s.endOffset)
      ChunkPiece(s.content, i, s.startOffset, s.endOffset,
        Some(s.boundary.copy(startLine = Some(startLine), endLine = Some(endLine))))
    }
}
