package graft
package operators

/** ANALYZE-style column profile ([[Relational.qTableStats]]): row
  * counts agree across columns, key columns profile as unique, and the
  * KMV column obeys the sketch contract (exact below K, bounded
  * relative error above).
  */
class TableStatsSpec extends SparkSpec {

  test("table stats: counts, uniqueness, and sketch contract") {
    val rows = Relational.qTableStats(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows.keySet ===
      Set("doc_id", "text", "lang", "source", "n_chars"))
    val n = Tables.documents(spark, sfDir).count()
    rows.values.foreach { case (rn, nNull, _, _, _) =>
      assert(rn === n)
      assert(nNull === 0L)
    }
    // primary key profiles as unique
    assert(rows("doc_id")._4 === n)
    val k = TextAnalysis.KmvK
    rows.foreach { case (c, (_, _, _, ndv, kmv)) =>
      if (ndv < k) assert(kmv === ndv, s"$c: kmv=$kmv ndv=$ndv")
      // KMV σ ≈ 1/√(K−2); 5σ bound, as KmvSpec
      else assert(math.abs(kmv - ndv).toDouble / ndv < 0.65,
        s"$c: kmv=$kmv ndv=$ndv")
    }
    // text total length is positive and ≥ the distinct-count floor
    assert(rows("text")._3 > 0)
  }
}
