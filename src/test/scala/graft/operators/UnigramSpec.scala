package graft
package operators

import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018) vs an independent in-memory
  * reference: same seeding, same hard-EM rounds, same pruning, same
  * Viterbi tie-breaks — plus the structural guarantees the model
  * family promises (full coverage via the char floor, lossless
  * segmentation, fertility no worse than char-splitting). */
class UnigramSpec extends SparkSpec {

  /** Straight-line reference trainer (no Spark): freq-weighted
    * substring seeding capped at UnigramSeedMultis, `rounds` of
    * Viterbi-count re-estimation with the char floor, prune to
    * vocabSize keeping all chars. Segmentation reimplemented
    * independently (plain DP, same deterministic tie semantics). */
  private def refSegment(word: String, counts: Map[String, Long],
      total: Long): Seq[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val fall = Array.fill(n + 1)(Int.MaxValue)
    val from = Array.fill(n + 1)(0)
    best(0) = 0.0; fall(0) = 0
    for (i <- 0 until n; if fall(i) != Int.MaxValue) {
      // coverage fallback first (one char, one use, no score)
      if (fall(i) + 1 < fall(i + 1) ||
          (fall(i) + 1 == fall(i + 1) && best(i) > best(i + 1))) {
        fall(i + 1) = fall(i) + 1; best(i + 1) = best(i); from(i + 1) = i
      }
      for (j <- (i + 1) to math.min(n, i + Curation.UnigramMaxPiece)) {
        counts.get(word.substring(i, j)).foreach { c =>
          val s = best(i) + math.log(c.toDouble / total)
          if (fall(i) < fall(j) || (fall(i) == fall(j) && s > best(j))) {
            fall(j) = fall(i); best(j) = s; from(j) = i
          }
        }
      }
    }
    var p = n
    var acc: List[String] = Nil
    while (p > 0) { val q = from(p); acc = word.substring(q, p) :: acc; p = q }
    acc
  }

  private def referenceTrain(words: Map[String, Long], vocabSize: Int,
      rounds: Int): Seq[(Long, String, Long, Long)] = {
    val sub = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (i <- 0 until w.length;
           j <- (i + 1) to math.min(w.length, i + Curation.UnigramMaxPiece))
        sub(w.substring(i, j)) = sub.getOrElse(w.substring(i, j), 0L) + f
    }
    val chars = sub.filter(_._1.length == 1).toMap
    var model: Map[String, Long] = chars ++
      sub.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(Curation.UnigramSeedMultis)
    for (_ <- 0 until rounds) {
      val pos = model.filter(_._2 > 0)
      val total = pos.values.sum
      val counted = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, f) =>
        refSegment(w, pos, total).foreach { p =>
          counted(p) = counted.getOrElse(p, 0L) + f
        }
      }
      val withChars = chars.keys
        .map(ch => ch -> counted.getOrElse(ch, 0L)).toMap
      model = withChars ++ counted.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - withChars.size))
    }
    val total = model.values.sum
    model.toSeq.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, c), i) => (i + 1L, p, c, c * 1000000L / total) }
  }

  test("trained model equals the reference implementation on a " +
      "hand corpus") {
    val spark2 = spark
    import spark2.implicits._
    val words = Map("internationalization" -> 4L, "international" -> 6L,
      "nation" -> 9L, "nationalization" -> 2L, "intern" -> 3L,
      "altered" -> 5L)
    val got = Curation.unigramTrainFromWords(spark,
        words.toSeq.toDF("word", "freq"), vocabSize = 30, rounds = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === referenceTrain(words, 30, 2))
    // multi-char pieces were actually learned
    assert(got.exists(_._2.length > 1))
  }

  test("corpus model: coverage, losslessness, fertility beats " +
      "char-splitting, registry determinism") {
    val spark2 = spark
    import spark2.implicits._
    val vocab = Curation.unigramTrain(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val model = vocab.filter(_._2 > 0)
    val total = model.values.sum
    // all corpus chars present in the vocabulary (coverage)
    val words = Curation.wordCounts(spark, sfDir)
      .select("word").as[String].collect()
    val missing = words.flatMap(_.toSeq).distinct
      .filterNot(c => vocab.contains(c.toString))
    assert(missing.isEmpty, s"chars absent from vocab: $missing")
    // every word segments losslessly, never worse than char-split
    words.foreach { w =>
      val segs = Curation.unigramSegment(w, model, total)
      assert(segs.mkString === w, s"lossy segmentation of '$w'")
      assert(segs.length <= w.length)
    }
    // the trained model genuinely compresses: strictly fewer tokens
    // than characters corpus-wide
    val enc = Curation.qUnigramEncode(spark, sfDir)
      .agg(sum("n_tokens"), sum("n_chars")).head
    assert(enc.getLong(0) < enc.getLong(1))
    // registry query is deterministic across invocations
    val a = Curation.qUnigramTrain(spark, sfDir).collect().toSeq
    val b = Curation.qUnigramTrain(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("LM scoring: word scores recompute exactly, per-doc totals " +
      "conserve the encode accounting, buckets spread") {
    val spark2 = spark
    import spark2.implicits._
    val vocab = Curation.unigramTrain(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val model = vocab.filter(_._2 > 0)
    val total = model.values.sum
    val words = Curation.qUnigramWords(spark, sfDir).collect()
    // each row's (n_tokens, n_fallback, logprob) equals a direct
    // in-spec recompute; on the training corpus fallback never fires
    words.foreach { r =>
      val (nt, nf, lp) =
        Curation.unigramWordScore(r.getString(0), model, total)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((nt, nf, lp)),
        s"word ${r.getString(0)}")
      assert(nf === 0L)
      assert(lp < 0L)
    }
    // per-doc token totals match the encode round trip doc for doc
    val ppl = Curation.qUnigramPpl(spark, sfDir)
    val enc = Curation.qUnigramEncode(spark, sfDir)
      .select(col("doc_id"), col("n_tokens").as("enc_tokens"))
    assert(ppl.join(enc, "doc_id")
      .filter(col("n_tokens") =!= col("enc_tokens")).count() === 0)
    // thresholds actually separate the corpus (no degenerate bucket)
    val buckets = ppl.groupBy("ppl_bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets.size >= 3, s"degenerate bucketing: $buckets")
  }

  test("coverage fallback: unseen characters segment losslessly and " +
      "carry the -log(total) penalty") {
    val spark2 = spark
    import spark2.implicits._
    val vocab = Curation.unigramTrain(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val model = vocab.filter(_._2 > 0)
    val total = model.values.sum
    // a word with chars entirely outside the trained vocabulary
    val oov = "@#%&"
    assert(oov.forall(c => !vocab.contains(c.toString)))
    val segs = Curation.unigramSegment(oov, model, total)
    assert(segs.mkString === oov)
    assert(segs.forall(_.length == 1)) // only fallback edges exist
    val (nt, nf, lp) = Curation.unigramWordScore(oov, model, total)
    assert(nt === oov.length.toLong && nf === oov.length.toLong)
    assert(lp ===
      math.round(-oov.length * math.log(total.toDouble) * 1000000))
    // mixed word: real pieces are preferred, fallback only where
    // no piece can cover — and the fallback count is minimal
    val mixed = "data@"
    val (mt, mf, mlp) = Curation.unigramWordScore(mixed, model, total)
    assert(mf === 1L, s"expected exactly one fallback char, got $mf")
    assert(mt < mixed.length.toLong + 1)
    assert(mlp < 0L)
    assert(Curation.unigramSegment(mixed, model, total).mkString === mixed)
  }
}
