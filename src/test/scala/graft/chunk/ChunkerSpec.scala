package graft.chunk

import org.scalatest.funsuite.AnyFunSuite

/** C1 sliding-window chunker semantics (reference
  * src/core/chunk/chunking.ts:42-108) + invariants the reference's tests
  * assert implicitly.
  */
class ChunkerSpec extends AnyFunSuite {

  test("text shorter than size yields one untrimmed chunk") {
    val out = Chunker.chunk("  hi  ", size = 10, overlap = 2)
    assert(out == Seq(graft.model.ChunkPiece("  hi  ", 0, 0, 6)))
  }

  test("fixed windows advance by size - overlap when words not preserved") {
    val text = "abcdefghijklmnopqrstuvwxyz"
    val out = Chunker.chunk(text, size = 10, overlap = 4, preserveWords = false)
    assert(out.map(_.content) == Seq("abcdefghij", "ghijklmnop", "mnopqrstuv", "stuvwxyz"))
    assert(out.map(_.start) == Seq(0, 6, 12, 18))
    assert(out.map(_.index) == Seq(0, 1, 2, 3))
  }

  test("word-boundary snap shrinks end to last space before the window edge") {
    val text = "aaa bbb ccc ddd eee fff"
    val out = Chunker.chunk(text, size = 10, overlap = 2, preserveWords = true)
    // first window [0,10) snaps back to the space at 7
    assert(out.head.content == "aaa bbb")
    assert(out.head.end == 7)
    // windows keep advancing on the unsnapped grid (step 8)
    assert(out(1).start == 8)
  }

  test("snap is skipped when it would not stay past the window start") {
    val text = "abcdefghij klmnopqrstuvwx"
    val out = Chunker.chunk(text, size = 10, overlap = 0, preserveWords = true)
    // window [10,20) contains the space at 10 == start → no snap
    assert(out.map(_.content).forall(_.nonEmpty))
  }

  test("all-whitespace windows are skipped without consuming an index") {
    val text = "aaaa" + (" " * 20) + "bbbb"
    val out = Chunker.chunk(text, size = 10, overlap = 0, preserveWords = false)
    assert(out.map(_.index) == out.indices.toSeq)
    assert(out.forall(_.content.nonEmpty))
  }

  test("line numbers are 1-based over [start,end)") {
    val text = "l1\nl2\nl3\nl4"
    assert(Chunker.lineNumbers(text, 0, 2) == (1, 1))
    assert(Chunker.lineNumbers(text, 3, 8) == (2, 3))
  }

  test("invariants: chunk <= size, offsets monotone, content matches slice") {
    val rnd = new scala.util.Random(42)
    def genText(): String = {
      val n = rnd.nextInt(200)
      Seq.fill(n) {
        val r = rnd.nextInt(11)
        if (r < 8) ('a' + rnd.nextInt(26)).toChar
        else if (r < 10) ' '
        else '\n'
      }.mkString
    }
    for (_ <- 1 to 300) {
      val text = genText()
      val size = 4 + rnd.nextInt(37)
      val ov = rnd.nextInt(3) min (size - 1)
      val out = Chunker.chunk(text, size, ov)
      if (text.length > size) {
        out.foreach { p =>
          assert(p.content.length <= size)
          assert(p.start < p.end)
          assert(p.content == text.substring(p.start, p.end).trim)
        }
        assert(out.map(_.start) == out.map(_.start).sorted)
        assert(out.map(_.index) == out.indices.toSeq)
      }
    }
  }
}
