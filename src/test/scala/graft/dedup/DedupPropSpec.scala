package graft
package dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.Embedder

/** Deterministic property tests for the hashing/dedup primitives —
  * generated inputs with fixed seeds, no Spark session needed. */
class DedupPropSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val words = Gen.oneOf("table", "scan", "fast", "join", "merge",
    "stream", "window", "batch", "sort", "hash", "group", "key", "row")
  private val docs: Gen[String] =
    Gen.chooseNum(10, 120).flatMap(n => Gen.listOfN(n, words).map(_.mkString(" ")))

  test("embedder: unit norm for non-empty text, zero vector for empty") {
    for (i <- 1L to 100L) {
      val text = sample(docs, i)
      val v = Embedder.embed(text)
      val norm = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-12, s"seed=$i")
    }
    assert(Embedder.embed("").forall(_ == 0.0))
    assert(Embedder.embed("   ").forall(_ == 0.0))
  }

  test("embedder: word order does not change the vector (bag semantics)") {
    for (i <- 1L to 50L) {
      val text = sample(docs, i)
      val shuffled = new scala.util.Random(i).shuffle(
        text.split(" ").toSeq).mkString(" ")
      assert(Embedder.embed(text).toSeq === Embedder.embed(shuffled).toSeq)
    }
  }

  test("hash60: stable, non-negative, 60-bit") {
    for (i <- 1L to 200L) {
      val s = sample(Gen.asciiPrintableStr, i)
      val h = Embedder.hash60(s)
      assert(h >= 0L && h < (1L << 60))
      assert(h === Embedder.hash60(s))
    }
  }

  test("minhash agreement approximates jaccard on constructed near-dups") {
    // doc B = doc A with a small suffix change → high true Jaccard on
    // 3-gram shingles → most of the 16 hash-family minima must agree
    def shingles(toks: Seq[String]): Set[String] =
      toks.sliding(3).map(_.mkString(" ")).toSet
    def sig(sh: Set[String]): Seq[Long] = {
      val hv = sh.map(s => Embedder.hash60(s) % operators.Dedup.MinhashP)
      operators.Dedup.minhashCoeffs.map { case (_, a, b) =>
        hv.map(h => (a * h + b) % operators.Dedup.MinhashP).min
      }
    }
    var agreeHigh = 0
    var agreeLow = 0
    for (i <- 1L to 20L) {
      val base = sample(docs, i).split(" ").toSeq.take(60)
      val near = base.dropRight(2) ++ Seq("zzz", "qqq")
      val far = sample(docs, i + 1000).split(" ").toSeq.take(60)
      val (sa, sb, sc) = (sig(shingles(base)), sig(shingles(near)), sig(shingles(far)))
      agreeHigh += sa.zip(sb).count { case (x, y) => x == y }
      agreeLow += sa.zip(sc).count { case (x, y) => x == y }
    }
    // near-dups agree on far more hash minima than unrelated docs
    assert(agreeHigh > agreeLow * 2, s"high=$agreeHigh low=$agreeLow")
  }

  test("simhash-style bit signature: identical inputs identical, small edits close") {
    def simhash(toks: Seq[String]): Int = {
      val cnt = toks.groupBy(identity).view.mapValues(_.size)
      (0 until 16).map { b =>
        val s = cnt.map { case (t, c) =>
          c * (((Embedder.hash60(t) >> b) & 1L) * 2 - 1)
        }.sum
        if (s >= 0) 1 << b else 0
      }.sum
    }
    def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    var near = 0
    var far = 0
    for (i <- 1L to 20L) {
      val base = sample(docs, i).split(" ").toSeq
      val edited = base.updated(base.size / 2, "zzz")
      val other = sample(docs, i + 5000).split(" ").toSeq
      near += hamming(simhash(base), simhash(edited))
      far += hamming(simhash(base), simhash(other))
      assert(simhash(base) === simhash(base))
    }
    assert(near < far, s"near=$near far=$far")
  }
}
