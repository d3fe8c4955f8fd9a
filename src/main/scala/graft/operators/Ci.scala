package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CI doc-impact analysis (SURVEY.md §2.12): given a set of change
  * terms, find the most-relevant document per source with the matched
  * terms attached — reference `analyzeDocuments`
  * (`src/core/ci/doc-service.ts:178-360`: per-file argmax similarity,
  * union of matched terms) re-expressed as ONE job.
  *
  * The reference loops ≤30 sequential searches, each re-scanning the
  * store; here the terms table joins the corpus once (broadcast — the
  * term list is tiny), and the per-source argmax is a window over the
  * already-scored candidates. At 100 TB: one corpus scan, no
  * driver-side loop (SURVEY.md §7.4 red flag #5 addressed).
  */
object Ci {

  /** The "changed symbols" of the simulated diff (D3 output shape). */
  val ChangeTerms = Seq("table", "scan", "fast")

  /** D5: per-source best-matching doc for the change set, with matched
    * terms and the doc's semantic score vs the change query. */
  def qDocImpact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val terms = ChangeTerms.toDF("term")
    val docs = Tables.documents(spark, dir)
    val matched = docs
      .crossJoin(broadcast(terms))
      .filter(col("text").contains(col("term")))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_matched"),
        array_join(array_sort(collect_list(col("term"))), ",").as("matched_terms"))
    val scored = matched.join(Search.scoredDocs(spark, dir), "doc_id")
    val w = Window.partitionBy("source").orderBy(desc("score"), col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("source", "doc_id", "score", "n_matched", "matched_terms")
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_impact" -> (qDocImpact _),
  )

  val oracles: Map[String, String] = Map(
    "q_doc_impact" ->
      s"""WITH ${Search.docVecCte},
         |${Search.queryScoreCte("", Search.QueryText)},
         |matched AS (
         |  SELECT doc_id, source, count(*) AS n_matched,
         |    string_agg(term, ',' ORDER BY term) AS matched_terms
         |  FROM documents
         |  CROSS JOIN (VALUES ('table'), ('scan'), ('fast')) t(term)
         |  WHERE contains(text, term)
         |  GROUP BY doc_id, source),
         |ranked AS (
         |  SELECT m.source, m.doc_id, sc.score, m.n_matched, m.matched_terms,
         |    row_number() OVER (PARTITION BY m.source
         |      ORDER BY sc.score DESC, m.doc_id) AS rn
         |  FROM matched m JOIN sc ON sc.doc_id = m.doc_id)
         |SELECT source, doc_id, score, n_matched, matched_terms
         |FROM ranked WHERE rn = 1 ORDER BY source""".stripMargin,
  )
}
