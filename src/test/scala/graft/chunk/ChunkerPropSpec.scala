package graft
package chunk

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the chunker family — the invariants the
  * reference asserts implicitly across its unit suite (SURVEY.md §5):
  * offsets are monotone windows, no chunk exceeds the size budget,
  * raw mode reconstructs losslessly for ARBITRARY input.
  *
  * Uses ScalaCheck generators sampled with fixed seeds (deterministic;
  * no scalatestplus bridge needed in the offline build).
  */
class ChunkerPropSpec extends AnyFunSuite {

  private val texts: Gen[String] = Gen.frequency(
    3 -> Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('\n')))
      .map(_.mkString),
    1 -> Gen.alphaNumStr)

  private val sizes: Gen[(Int, Int)] = for {
    size <- Gen.choose(2, 200)
    overlap <- Gen.choose(0, size - 1)
  } yield (size, overlap)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def cases: Seq[(String, Int, Int)] =
    (1L to 300L).map { i =>
      val text = sample(texts, i)
      val (size, overlap) = sample(sizes, i * 7919)
      (text, size, overlap)
    }

  test("chunkRaw: lossless reconstruction for arbitrary text/size/overlap") {
    for ((text, size, overlap) <- cases) {
      val pieces = Chunker.chunkRaw(text, size, overlap)
      val rebuilt = pieces.sortBy(_.index).zipWithIndex.map {
        case (p, 0) => p.content
        case (p, _) => p.content.substring(overlap)
      }.mkString
      assert(rebuilt === text, s"size=$size overlap=$overlap len=${text.length}")
      pieces.foreach { p =>
        assert(p.content.length <= size)
        assert(p.content === text.substring(p.start, p.end))
      }
    }
  }

  test("chunk (word-snap mode): pieces within budget, indexes contiguous") {
    for ((text, size, overlap) <- cases) {
      val pieces = Chunker.chunk(text, size, overlap, preserveWords = true)
      assert(pieces.map(_.index) === pieces.indices)
      pieces.foreach(p => assert(p.content.length <= size))
      pieces.foreach(p =>
        assert(text.substring(p.start, p.end).contains(p.content)))
    }
  }

  test("tokenizer: no empties, lowercase-stable") {
    for ((text, _, _) <- cases) {
      val toks = graft.embed.Embedder.tokenize(text)
      assert(!toks.exists(_.isEmpty))
      assert(toks.forall(t => t == t.toLowerCase))
    }
  }
}
