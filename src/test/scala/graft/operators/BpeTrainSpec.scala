package graft
package operators

import org.apache.spark.sql.functions._

/** BPE training loop vs an independent in-memory reference
  * implementation of Sennrich et al. 2016's Algorithm 1, plus the
  * round-0 agreement with the oracle-checked q_bpe_pairs step. */
class BpeTrainSpec extends SparkSpec {

  /** Straight-line reference trainer (no Spark): the same counting
    * (every adjacent position, freq-weighted), the same argmax
    * tie-break (count desc, then lexicographic), the same
    * left-to-right non-overlapping apply. */
  private def referenceTrain(words: Map[String, Long],
      merges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Seq[String], Long] =
      words.map { case (w, f) => (w.map(_.toString): Seq[String], f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continueLoop = true
    var i = 0
    while (i < merges && continueLoop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) continueLoop = false
      else {
        val ((a, b), c) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((a, b, c))
        vocab = vocab.map { case (syms, f) =>
          (Curation.mergePair(syms, a, b), f)
        }
        i += 1
      }
    }
    out.toSeq
  }

  test("trained merges equal the reference implementation on the " +
      "classic corpus") {
    val spark2 = spark
    import spark2.implicits._
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val got = Curation.bpeTrainFromWords(spark,
        words.toSeq.toDF("word", "freq"), merges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === referenceTrain(words, 8))
    // the classic first merges: 'e s' (9 = 6+3) then 'es t' (9)
    assert(got.take(2) === Seq(("e", "s", 9L), ("es", "t", 9L)))
  }

  test("merge exhaustion stops the loop early instead of padding") {
    val spark2 = spark
    import spark2.implicits._
    val words = Map("ab" -> 3L) // one merge possible, then single symbols
    val got = Curation.bpeTrainFromWords(spark,
      words.toSeq.toDF("word", "freq"), merges = 10).collect()
    assert(got.length === 1)
    assert((got(0).getString(1), got(0).getString(2)) === ("a", "b"))
  }

  test("round 0 of the trainer agrees with the q_bpe_pairs step on " +
      "the corpus") {
    val firstMerge = Curation.bpeTrain(spark, sfDir, merges = 1).collect()(0)
    val topPair = Curation.qBpePairs(spark, sfDir).collect()(0)
    assert(firstMerge.getString(1) + firstMerge.getString(2) ===
      topPair.getString(0))
    assert(firstMerge.getLong(3) === topPair.getLong(1))
  }

  test("trainer is deterministic across runs") {
    val a = Curation.bpeTrain(spark, sfDir, merges = 5).collect().toSeq
    val b = Curation.bpeTrain(spark, sfDir, merges = 5).collect().toSeq
    assert(a === b)
  }
}
