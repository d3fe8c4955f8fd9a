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
      fromCache: Option[String],
      queryAnalysis: Option[QueryAnalysis] = None,
      nextActions: Seq[NextAction] = Seq.empty,
      toolSuggestions: Seq[ToolSuggestion] = Seq.empty,
      considerations: Seq[Consideration] = Seq.empty,
      problems: Seq[Problem] = Seq.empty,
      progress: Option[Progress] = None)

  /** A13 single-hit classifier — the reference's detectContentType
    * chain verbatim (metadata-generator.ts:272-306): code → example →
    * configuration → documentation → text, first match wins. */
  private[api] def contentTypeOf(text: String): String = {
    val lower = text.toLowerCase
    if ("""function\s+\w+\s*\(|const\s+\w+\s*=|class\s+\w+|import\s+.*from|export\s+"""
        .r.findFirstIn(text).isDefined) "code"
    else if ("""example:|usage:|demo:|sample:""".r.findFirstIn(lower).isDefined)
      "example"
    else if ("""(?s)\{.*"[^"]*":.*\}""".r.findFirstIn(text).isDefined ||
        """(?m)^\s*\w+:\s*\w+""".r.findFirstIn(text).isDefined) "configuration"
    else if ("""^#{1,6}\s+""".r.findFirstIn(text).isDefined ||
        """^\*\s+""".r.findFirstIn(text).isDefined) "documentation"
    else "text"
  }

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

  // ---- typed rule-engine output (reference agent-query-tool.ts
  // NextActionSuggestion / ToolSuggestion / StrategicConsideration /
  // PotentialProblem / ProgressTracking shapes) ----

  case class QueryAnalysis(complexity: String, specificity: Double,
      ambiguity: Seq[String], queryType: String, language: String)
  case class NextAction(action: String, reasoning: String,
      confidence: Double, suggestedQuery: Option[String])
  case class ToolSuggestion(tool: String, purpose: String,
      priority: String, estimatedValue: Double)
  case class Consideration(consideration: String, importance: String)
  case class Problem(problem: String, likelihood: Double, impact: String,
      mitigation: String)
  case class Progress(goalAlignment: Double, estimatedCompletion: Double,
      milestones: Seq[String])

  /** The heuristic rule engine, reference thresholds verbatim
    * (agent-query-tool.ts:290-533) — every function is pure and
    * unit-tested against the reference's trigger conditions. */
  object AgentRules {

    /** agent-query-tool.ts:290-330. */
    def analyzeQuery(query: String): QueryAnalysis = {
      val words = query.split("\\s+").toSeq
      val lower = query.toLowerCase
      val complexity =
        if (words.length <= 3) "simple"
        else if (words.length <= 7) "moderate"
        else "complex"
      val specific = words.count(w => w.length > 5 || w.exists(_.isUpper))
      val specificity = math.min(1.0, specific.toDouble / math.max(1, words.length))
      val ambiguity = words.filter(w =>
        w.length <= 2 || Set("it", "this", "that", "they")(w.toLowerCase))
      val queryType =
        if ("""how|what|why|when|where|who""".r.findFirstIn(lower).isDefined)
          "factual"
        else if ("""implement|create|build|make""".r.findFirstIn(lower).isDefined)
          "transactional"
        else if ("""go to|find|locate|search""".r.findFirstIn(lower).isDefined)
          "navigational"
        else "exploratory"
      // reference regex ranges: hiragana U+3040-309F, katakana
      // U+30A0-30FF, CJK unified U+4E00-9FAF
      val language =
        if (query.exists(c => (c >= 0x3040 && c <= 0x30FF) ||
          (c >= 0x4E00 && c <= 0x9FAF))) "ja" else "en"
      QueryAnalysis(complexity, specificity, ambiguity, queryType, language)
    }

    /** agent-query-tool.ts:337-403, sorted by confidence desc. */
    def nextActions(query: String, n: Int, avgScore: Double,
        coverageGaps: Seq[String], redundancy: Double): Seq[NextAction] = {
      val out = Seq.newBuilder[NextAction]
      if (n == 0 || avgScore < 0.3)
        out += NextAction("broaden",
          "Current query returned no high-quality results", 0.9,
          Some(s"$query OR related OR similar"))
      if (avgScore > 0.6 && n >= 3)
        out += NextAction("write_structured_result",
          "Good results found — save the analysis as structured knowledge",
          1.0, None)
      if (coverageGaps.nonEmpty)
        out += NextAction("refine",
          s"Missing coverage for: ${coverageGaps.mkString(", ")}", 0.8,
          Some(s"$query ${coverageGaps.head}"))
      if (n < 3)
        out += NextAction("index_more",
          "Limited results available in current index", 0.7, None)
      if (redundancy > 0.7)
        out += NextAction("pivot",
          "Results are too similar, need different perspective", 0.75,
          Some(s"alternative approach to $query"))
      out.result().sortBy(-_.confidence)
    }

    /** agent-query-tool.ts:407-450. */
    def toolSuggestions(n: Int, avgScore: Double,
        diversity: Double): Seq[ToolSuggestion] = {
      val out = Seq.newBuilder[ToolSuggestion]
      if (avgScore > 0.7 && n >= 5)
        out += ToolSuggestion("write_structured_result",
          "Save your comprehensive analysis as structured knowledge",
          "high", 0.9)
      if (diversity < 0.3)
        out += ToolSuggestion("query_simple",
          "Use hybrid search for more diverse results", "high", 0.8)
      if (n < 5)
        out += ToolSuggestion("index",
          "Index additional content to expand search space", "medium", 0.7)
      out.result()
    }

    /** agent-query-tool.ts:454-483. */
    def considerations(complexity: String, predominantType: String,
        hasExamples: Boolean): Seq[Consideration] = {
      val out = Seq.newBuilder[Consideration]
      if (complexity == "complex")
        out += Consideration(
          "Complex query may benefit from decomposition", "important")
      if (predominantType == "code" && !hasExamples)
        out += Consideration(
          "Code without examples may be difficult to understand", "important")
      out.result()
    }

    /** agent-query-tool.ts:487-512. */
    def problems(scoreStddev: Double,
        ambiguity: Seq[String]): Seq[Problem] = {
      val out = Seq.newBuilder[Problem]
      if (scoreStddev > 0.3)
        out += Problem("High variance in result quality", 0.8, "medium",
          "Focus on high-scoring results or refine query")
      if (ambiguity.nonEmpty)
        out += Problem("Query contains ambiguous terms", 0.6, "low",
          "Clarify ambiguous terms with more specific language")
      out.result()
    }

    /** agent-query-tool.ts:516-533. */
    def progress(n: Int, hasHighQuality: Boolean): Progress = {
      val milestones = Seq.newBuilder[String]
      if (n > 0) milestones += "Found relevant content"
      if (hasHighQuality) milestones += "Identified high-quality matches"
      Progress(
        goalAlignment =
          if (hasHighQuality) 0.8 else if (n > 0) 0.5 else 0.2,
        estimatedCompletion = math.min(1.0, n / 10.0),
        milestones = milestones.result())
    }

    /** A12 redundancy — mean pairwise Jaccard of result word sets
      * (agent-query-tool.ts:256-270); 0 for < 2 results. */
    def redundancyOf(contents: Seq[String]): Double =
      if (contents.length < 2) 0.0
      else {
        val sets = contents.map(_.toLowerCase.split("\\s+")
          .filter(_.nonEmpty).toSet)
        val pairs = for {
          i <- sets.indices; j <- (i + 1) until sets.length
        } yield {
          val inter = sets(i).intersect(sets(j)).size.toDouble
          val union = sets(i).union(sets(j)).size
          if (union == 0) 0.0 else inter / union
        }
        pairs.sum / pairs.length
      }

    /** A11 Simpson diversity 1 − Σp² (metadata-generator.ts:160-203):
      * the pooled counts are over each result's `extractKeywords`
      * output (stop-word-filtered, minLength 2, DISTINCT per result —
      * so a keyword's count is the number of results containing it),
      * not raw whitespace tokens. */
    def diversityOf(contents: Seq[String]): Double = {
      val counts = collection.mutable.Map.empty[String, Int]
      contents.foreach(c => Keywords.extract(c).foreach(w =>
        counts.update(w, counts.getOrElse(w, 0) + 1)))
      val total = counts.values.sum.toDouble
      if (total == 0) 0.0
      else 1.0 - counts.values.map(n => math.pow(n / total, 2)).sum
    }

    /** The coherence twin from the same pass: |keywords seen in >1
      * result| / |all keywords|, capped at 1 (metadata-generator.ts:
      * 175-179). */
    def coherenceOf(contents: Seq[String]): Double = {
      val counts = collection.mutable.Map.empty[String, Int]
      contents.foreach(c => Keywords.extract(c).foreach(w =>
        counts.update(w, counts.getOrElse(w, 0) + 1)))
      if (counts.isEmpty) 0.0
      else math.min(1.0, counts.values.count(_ > 1).toDouble / counts.size)
    }

    /** Predominant content type over classified hits — the reference's
      * analyzeContentCharacteristics chain (metadata-generator.ts:
      * 487-501): code&&docs → mixed, code → code, docs →
      * documentation, example → example, else mixed. Presence-based,
      * NOT modal: one code hit among nine text hits still yields
      * "code". */
    def predominantOf(types: Seq[String]): String = {
      val hasCode = types.contains("code")
      val hasDocs = types.contains("documentation")
      val hasExamples = types.contains("example")
      if (hasCode && hasDocs) "mixed"
      else if (hasCode) "code"
      else if (hasDocs) "documentation"
      else if (hasExamples) "example"
      else "mixed"
    }
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

    // full rule-engine pass over the collected page (O(k) driver work)
    val qa = AgentRules.analyzeQuery(queryText)
    val contents = hits.map(_.content)
    val redundancy = AgentRules.redundancyOf(contents)
    val diversity = AgentRules.diversityOf(contents)
    val mean = analysis.meanScore
    val stddev =
      if (scores.isEmpty) 0.0
      else math.sqrt(scores.map(s => (s - mean) * (s - mean)).sum / scores.size)
    val types = hits.map(h => contentTypeOf(h.content))
    val predominant = AgentRules.predominantOf(types)

    cache.foreach(_.record(queryText, hits.size.toLong))
    Response(hits, analysis, next, fromCache,
      queryAnalysis = Some(qa),
      nextActions = AgentRules.nextActions(queryText, hits.size, mean,
        missing, redundancy),
      toolSuggestions = AgentRules.toolSuggestions(hits.size, mean, diversity),
      considerations = AgentRules.considerations(qa.complexity, predominant,
        types.contains("example")),
      problems = AgentRules.problems(stddev, qa.ambiguity),
      progress = Some(AgentRules.progress(hits.size, scores.exists(_ > 0.8))))
  }
}
