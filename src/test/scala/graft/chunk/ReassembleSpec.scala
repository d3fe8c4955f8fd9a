package graft
package chunk

import org.scalatest.funsuite.AnyFunSuite

/** chunkRaw invariants: exact windows, lossless overlap-strip
  * reconstruction for every length/size/overlap combination around the
  * step-grid edge cases. */
class ReassembleSpec extends AnyFunSuite {

  private def reconstruct(pieces: Seq[model.ChunkPiece], overlap: Int): String =
    pieces.sortBy(_.index).zipWithIndex.map {
      case (p, 0) => p.content
      case (p, _) => p.content.substring(overlap)
    }.mkString

  private val rnd = new scala.util.Random(42)

  test("round trip is lossless across lengths incl. grid boundaries") {
    val size = 100
    val overlap = 20
    val step = size - overlap
    val lengths = Seq(0, 1, 99, 100, 101, 159, 160, 161, 179, 180, 181,
      240, 500, 1000, 1001) ++ Seq.fill(20)(rnd.nextInt(2000))
    for (len <- lengths) {
      val text = rnd.alphanumeric.take(len).mkString
      val pieces = Chunker.chunkRaw(text, size, overlap)
      assert(reconstruct(pieces, overlap) === text, s"len=$len")
      // offsets are the exact windows
      pieces.foreach { p =>
        assert(p.content === text.substring(p.start, p.end))
        assert(p.content.length <= size)
      }
      // indexes contiguous from 0, starts on the step grid
      assert(pieces.map(_.index) === pieces.indices)
      pieces.foreach(p => assert(p.start % step === 0))
    }
  }

  test("varied size/overlap combos round trip") {
    for ((size, overlap) <- Seq((10, 3), (50, 25), (64, 0), (7, 6))) {
      val text = rnd.alphanumeric.take(333).mkString
      val pieces = Chunker.chunkRaw(text, size, overlap)
      assert(reconstruct(pieces, overlap) === text, s"size=$size ov=$overlap")
    }
  }
}
