package graft
package operators

import org.apache.spark.sql.functions._

/** Release-diff semantics on a hand-built two-version corpus, plus the
  * token-conservation invariant on the registered query. */
class CorpusDiffSpec extends SparkSpec {

  test("every change class is detected with exact token accounting") {
    val spark2 = spark
    import spark2.implicits._
    val v1 = Seq(
      (1L, "en", "a b c"), (2L, "en", "x y"),
      (3L, "de", "k"), (4L, "en", "m n o p"))
      .toDF("doc_id", "lang", "text")
    val v2 = Seq(
      (1L, "en", "a b c"), (2L, "en", "x y z"),
      (3L, "de", "k"), (5L, "en", "q r"))
      .toDF("doc_id", "lang", "text")
    val got = Curation.corpusDiff(v1, v2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      ("de", "unchanged", 1L, 0L, 1L),
      ("en", "added", 1L, 2L, 2L),
      ("en", "changed", 1L, 1L, 3L),
      ("en", "removed", 1L, -4L, 0L),
      ("en", "unchanged", 1L, 0L, 3L)))
  }

  test("token deltas conserve: report sum == corpus v2 - v1 totals") {
    val docs = Tables.documents(spark, sfDir)
    def tokens(df: org.apache.spark.sql.DataFrame): Long = df
      .agg(sum(size(TextAnalysis.toks(col("text")))).cast("long"))
      .collect()(0).getLong(0)
    val v1Toks = tokens(docs)
    val report = Curation.qCorpusDiff(spark, sfDir).collect()
    val delta = report.map(_.getLong(3)).sum
    val v2Toks = report.map(_.getLong(4)).sum
    assert(v1Toks + delta === v2Toks)
    // the simulated release really exercises all four classes
    assert(report.map(_.getString(1)).toSet ===
      Set("added", "removed", "changed", "unchanged"))
  }
}
