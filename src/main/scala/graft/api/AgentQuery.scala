package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q6 agent query tool (reference `src/mcp/tools/agent-query-tool.ts:
  * 115-1172`): one call = search + result analytics + heuristic
  * guidance + cursor pagination + query-cache integration.
  *
  * Division of labor at scale: the corpus-side work (scoring, top-k)
  * is the same distributed search the CLI path uses; every analysis
  * below runs on the collected top-k page (≤ pageSize·3 rows — the
  * reference caps k ≤ 5, pageSize ≤ 10), so the driver-side rule
  * engine is O(k) regardless of corpus size.
  */
object AgentQuery {

  case class Hit(id: String, sourceId: String, chunkIndex: Int,
      content: String, score: Double, sourceType: String)

  case class Analysis(
      nResults: Int,
      meanScore: Double,
      maxScore: Double,
      minScore: Double,
      keywordCoverage: Double,
      missingKeywords: Seq[String],
      contentTypes: Map[String, Int],
      suggestions: Seq[String],
      estTokens: Long)

  case class Response(
      hits: Seq[Hit],
      analysis: Analysis,
      nextCursor: Option[String],
      fromCache: Option[String])

  /** A13-style single-hit classifier (regex chain, first match). */
  private[api] def contentTypeOf(text: String): String =
    if (text.contains("```") || text.matches("(?s).*\\b(function|class|def)\\b.*"))
      "code"
    else if (text.matches("(?s).*\\b(install|setup|configure)\\b.*")) "configuration"
    else if (text.matches("(?s).*(^|\\n)#+\\s.*")) "documentation"
    else "text"

  /** The heuristic rule engine (reference agent-query-tool.ts:337-533)
    * — pure function of the analysis, unit-testable. */
  private[api] def suggest(nResults: Int, mean: Double, coverage: Double,
      missing: Seq[String], hybrid: Boolean): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (nResults == 0) {
      out += "no results: try hybrid search or broaden the query"
    } else {
      if (mean < 0.3)
        out += "low relevance: rephrase with more specific terms"
      if (missing.nonEmpty)
        out += s"keywords not found in results: ${missing.mkString(", ")} — consider a follow-up query for them"
      if (!hybrid && coverage < 1.0)
        out += "partial keyword coverage: hybrid search may rank exact matches higher"
    }
    out.result()
  }

  /** Response-size budgets per mode (reference caps summary ≈5K /
    * detailed ≈15K tokens — `src/mcp/server.ts:107-133`; here the
    * lever is per-hit content truncation, token estimate = ceil(len/4)
    * as in X15). */
  private val ModeChars = Map("summary" -> 200, "detailed" -> 1000,
    "full" -> Int.MaxValue)

  def query(
      spark: SparkSession,
      storePath: String,
      queryText: String,
      hybrid: Boolean = false,
      pageSize: Int = 5,
      cursor: Option[String] = None,
      cache: Option[QueryCache] = None,
      mode: String = "detailed"): Response = {
    val budget = ModeChars.getOrElse(mode, 1000)

    val fromCache = cache.flatMap(_.findSimilar(queryText))
      .filter(_ != queryText)

    val totalK = pageSize * 3 // reference fetches pageSize*3 for pagination
    val ranked: DataFrame =
      if (hybrid) IndexPipeline.hybridSearch(spark, storePath, queryText, totalK)
      else IndexPipeline.search(spark, storePath, queryText, totalK)

    val (pageDf, next) = Cursor.page(ranked, queryText, cursor, pageSize)
    val hits = pageDf.collect().map { r =>
      Hit(r.getAs[String]("id"), r.getAs[String]("sourceId"),
        r.getAs[Int]("chunkIndex"),
        r.getAs[String]("content").take(budget),
        r.getAs[Double]("score"), r.getAs[String]("sourceType"))
    }.toSeq

    val words = queryText.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val found = words.filter(w => hits.exists(_.content.toLowerCase.contains(w)))
    val coverage = if (words.isEmpty) 1.0 else found.size.toDouble / words.size
    val missing = words.diff(found)
    val scores = hits.map(_.score)
    val analysis = Analysis(
      nResults = hits.size,
      meanScore = if (scores.isEmpty) 0.0 else scores.sum / scores.size,
      maxScore = if (scores.isEmpty) 0.0 else scores.max,
      minScore = if (scores.isEmpty) 0.0 else scores.min,
      keywordCoverage = coverage,
      missingKeywords = missing,
      contentTypes = hits.groupBy(h => contentTypeOf(h.content))
        .map { case (k, v) => k -> v.size },
      suggestions = suggest(hits.size,
        if (scores.isEmpty) 0.0 else scores.sum / scores.size,
        coverage, missing, hybrid),
      estTokens = math.ceil(hits.map(_.content.length).sum / 4.0).toLong)

    cache.foreach(_.record(queryText, hits.size.toLong))
    Response(hits, analysis, next, fromCache)
  }
}
