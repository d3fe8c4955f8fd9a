package graft
package operators

/** BPE encode (the serving half of the tokenizer lifecycle) vs an
  * independent priority-order reference: [[Curation.encodeWord]]
  * applies merges in RANK order (the trainer's own apply), production
  * tokenizers merge the lowest-rank adjacent pair first — the spec
  * pins their equivalence, the Sennrich worked example, the lossless
  * concat property, and the distributed aggregation against an
  * in-memory per-document twin.
  */
class BpeEncodeSpec extends SparkSpec {

  /** Independent reference: repeatedly merge ALL occurrences of the
    * lowest-rank adjacent pair present (left-to-right), until no
    * learnable pair remains — the HuggingFace-style priority apply,
    * deliberately NOT rank-sequential like encodeWord. */
  private def priorityEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms: Seq[String] = word.map(_.toString)
    var done = false
    while (!done && syms.length >= 2) {
      val present = syms.sliding(2).collect {
        case Seq(a, b) if rank.contains((a, b)) => (a, b)
      }.toSeq
      if (present.isEmpty) done = true
      else {
        val (a, b) = present.minBy(rank)
        syms = Curation.mergePair(syms, a, b)
      }
    }
    syms
  }

  private val classic = Seq(("e", "s"), ("es", "t"))

  test("the Sennrich worked example encodes as expected") {
    assert(Curation.encodeWord("newest", classic) ===
      Seq("n", "e", "w", "est"))
    assert(Curation.encodeWord("widest", classic) ===
      Seq("w", "i", "d", "est"))
    // no learnable pair present — identity to characters
    assert(Curation.encodeWord("low", classic) === Seq("l", "o", "w"))
  }

  test("rank-order apply equals the priority-order reference on " +
      "trained merges") {
    val spark2 = spark
    import spark2.implicits._
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "lowest" -> 4L, "newer" -> 2L)
    val merges = Curation.bpeTrainFromWords(spark,
        words.toSeq.toDF("word", "freq"), merges = 12)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // in-vocab words, plus unseen words built from the same alphabet
    (words.keys.toSeq ++ Seq("slowest", "tidiest", "wet", "neonest"))
      .foreach { w =>
        val got = Curation.encodeWord(w, merges)
        assert(got === priorityEncode(w, merges), s"word $w")
        assert(got.mkString === w, s"lossy encode of $w")
      }
  }

  test("q_bpe_encode matches an in-memory per-document twin at " +
      "sf0.001") {
    val spark2 = spark
    import spark2.implicits._
    val merges = Curation.bpeTrain(spark, sfDir, Curation.BpeMerges)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val expected = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        (id, ws.length.toLong,
          ws.map(w => Curation.encodeWord(w, merges).length.toLong).sum,
          ws.map(_.length.toLong).sum)
      }.sortBy(_._1).toSeq
    val got = Curation.qBpeEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // merges actually fire: trained tokens strictly beat char count
    // and are at least the word count
    assert(got.forall { case (_, nw, nt, nc) => nt >= nw && nt < nc })
  }

  test("fertility audit covers every doc and stays within the " +
      "token-count bounds") {
    val rows = Curation.qTokFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nt, nc) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nt >= nw && nt <= nc, r.toString)
      // ≥1 token per word by definition of the word-level encode
      assert(r.getLong(5) >= 1000L, r.toString)
      assert(r.getLong(6) >= 1000L, r.toString)
    }
    assert(rows.map(_.getLong(1)).sum ===
      Tables.documents(spark, sfDir).count())
  }
}
