package graft.ci

import org.apache.spark.sql.DataFrame

/** D6 output formatters (reference `src/core/ci/formatters.ts`):
  * render the doc-impact result as the grouped PR comment (severity
  * bands by similarity: high ≥ 0.8 / medium ≥ 0.5 / low) or as JSON
  * lines. Driver-side rendering of an already-collected top-N — the
  * heavy lifting happened in the one-job impact query
  * (`graft.operators.Ci.qDocImpact`).
  */
object Formatters {

  case class Impact(source: String, docId: Long, score: Double,
      matchedTerms: String)

  def collectImpacts(df: DataFrame, cap: Int = 100): Seq[Impact] =
    df.limit(cap).collect().map { r =>
      Impact(r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[String]("matched_terms"))
    }.toSeq

  private def band(score: Double): (String, String) =
    if (score >= 0.8) ("high", "🔴")       // red circle
    else if (score >= 0.5) ("medium", "🟡") // yellow circle
    else ("low", "🟢")                      // green circle

  /** Markdown PR comment grouped by severity, highest first. */
  def toMarkdown(impacts: Seq[Impact], threshold: Double = 0.0): String = {
    val kept = impacts.filter(_.score >= threshold)
    if (kept.isEmpty) return "## Doc impact\n\nNo affected documents.\n"
    val groups = kept.groupBy(i => band(i.score))
    val order = Seq(("high", "🔴"), ("medium", "🟡"),
      ("low", "🟢"))
    val sb = new StringBuilder("## Doc impact\n")
    for (key @ (label, emoji) <- order; items <- groups.get(key)) {
      sb.append(s"\n### $emoji $label\n\n")
      for (i <- items.sortBy(x => (-x.score, x.source)))
        sb.append(f"- `${i.source}` doc ${i.docId} (score ${i.score}%.4f)" +
          s" — terms: ${i.matchedTerms}\n")
    }
    sb.toString
  }

  /** X14: GitHub source URL with plain-view + line anchors (reference
    * `src/core/ci/doc-service.ts:108-173` — `?plain=1` forces raw
    * markdown so the `#L<start>-L<end>` anchor resolves). */
  def githubUrl(owner: String, repo: String, branch: String, path: String,
      startLine: Option[Int] = None, endLine: Option[Int] = None): String = {
    val base = s"https://github.com/$owner/$repo/blob/$branch/$path?plain=1"
    (startLine, endLine) match {
      case (Some(s), Some(e)) => s"$base#L$s-L$e"
      case (Some(s), None)    => s"$base#L$s"
      case _                  => base
    }
  }

  /** JSON-lines rendering (one object per impact, stable field order). */
  def toJsonLines(impacts: Seq[Impact]): String =
    impacts.map { i =>
      val terms = i.matchedTerms.split(",").filter(_.nonEmpty)
        .map(t => "\"" + t + "\"").mkString("[", ",", "]")
      s"""{"source":"${i.source}","doc_id":${i.docId},"score":${i.score},"matched_terms":$terms}"""
    }.mkString("", "\n", "\n")
}
