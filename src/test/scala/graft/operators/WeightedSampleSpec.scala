package graft
package operators

/** Weighted sampling vs a straight-line in-memory Efraimidis-Spirtakis
  * reference sharing the hash coin and the micro-rounding discipline. */
class WeightedSampleSpec extends SparkSpec {

  private def key(id: Long, w: Long): Long = {
    val h = graft.embed.Embedder.hash60(s"wsamp:$id")
    math.round(-math.log((h + 1).toDouble / 1152921504606846976.0) *
      1e6 / w)
  }

  test("sample matches the in-memory reference race, rank for rank") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
      xs.map(x => (key(x._2, x._3), x._2, x._3))
        .sortBy(t => (t._1, t._2))
        .take(Curation.SampleK).zipWithIndex
        .map { case ((k, id, nc), i) => (lang, i + 1L, id, nc, k) }
    }.sortBy(t => (t._1, t._2))
    val got = Curation.qWeightedSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("the race favors weight: a doc's key shrinks as its weight " +
      "grows") {
    // same coin, larger w => smaller (or equal) key — the E-S
    // monotonicity that makes heavier docs proportionally likelier
    Seq(1L, 7L, 1000L).foreach { id =>
      val ks = Seq(10L, 100L, 1000L).map(w => key(id, w))
      assert(ks === ks.sorted.reverse, s"doc $id keys $ks")
    }
  }
}
