package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator
import graft.operators.TextAnalysis

/** Streaming heavy hitters — the ingest-side twin of
  * [[TextAnalysis.qHeavyHitters]]: the mergeable Misra–Gries summary
  * runs AS the streaming aggregation state, so a corpus arriving over
  * days keeps a live candidate set in O(counters) state — no
  * token-keyed state store growing with the vocabulary, no watermark
  * needed (the sketch is the bound).
  *
  * Because MG summaries merge associatively with the additive-error
  * guarantee intact (Agarwal et al., PODS 2012), the micro-batch merge
  * tree — whatever the arrival order — still yields a summary whose
  * survivors contain every token above N/(c+1). The exact report then
  * comes from replaying [[TextAnalysis.hittersFromCandidates]] over
  * the archived corpus at read time (the same
  * sketch-candidates-then-exact-verify contract as the batch query,
  * proven equivalent in StreamingHittersSpec).
  */
object StreamingHitters {

  /** Token stream → running merged MG summary (one row per
    * micro-batch in update/complete mode; bounded state: ≤ `c`
    * counters however many tokens have streamed) plus the running
    * stream length. */
  def summaryStream(tokens: Dataset[String],
      c: Int = TextAnalysis.MgCounters): DataFrame = {
    import tokens.sparkSession.implicits._
    tokens
      .groupByKey(_ => 0)
      .agg(MisraGriesAggregator.mg(c))
      .toDF("g", "sk")
      .select(col("sk.items").as("summary"), col("sk.n").as("n_streamed"))
  }

  /** Sink-side exact verify: the FINAL streamed summary's survivor set
    * exact-counted against the archived corpus — identical output
    * schema (and, by the superset guarantee, identical rows) to the
    * batch [[TextAnalysis.qHeavyHitters]]. */
  def hittersFromSummary(summary: Seq[(String, Long)],
      archivedTokens: DataFrame): DataFrame = {
    val spark = archivedTokens.sparkSession
    import spark.implicits._
    TextAnalysis.hittersFromCandidates(archivedTokens,
      summary.map(_._1).toDF("word"))
  }
}
