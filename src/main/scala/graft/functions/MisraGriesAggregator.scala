package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries summary + the stream length it was built over (the
  * heavy-hitter threshold is N-relative, so carrying N in the sketch
  * saves the verify pass a third scan of the token stream). */
case class MgSummary(items: Seq[(String, Long)], n: Long)

/** Mergeable Misra–Gries frequent-items summary (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012):
  * a typed `Aggregator` whose buffer is AT MOST `c` (token, count)
  * entries plus the running stream length, however many rows flow
  * through it. Spark runs it with map-side partial aggregation, so
  * each upstream partition ships one bounded summary into the
  * shuffle — the whole corpus is never grouped by token.
  *
  * Guarantee (the one [[graft.operators.TextAnalysis.qHeavyHitters]]
  * builds on): for any item with true frequency > N/(c+1), the merged
  * summary still contains it — decrements are bounded by N/(c+1)
  * TOTAL across arbitrary merge trees, so a frequency above that
  * bound cannot reach zero. The summary is therefore a guaranteed
  * SUPERSET of the items at or above any threshold ≥ N/(c+1); an
  * exact count-verify pass over just those candidates turns the
  * sketch into an exact answer (the Bloom-prefilter-then-verify
  * pattern `q_bloom_decon` uses). Stored counts only ever
  * underestimate.
  *
  * Buffer entries are kept sorted by (count desc, token asc) only at
  * `finish`; internally a plain Map keeps reduce O(1) per row.
  */
class MisraGriesAggregator(c: Int)
    extends Aggregator[String, (Map[String, Long], Long), MgSummary] {
  require(c >= 1, s"counter budget out of range: $c")

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(buf: (Map[String, Long], Long),
      tok: String): (Map[String, Long], Long) = {
    val (m, n) = buf
    val next = m.get(tok) match {
      case Some(k) => m.updated(tok, k + 1)
      case None if m.size < c => m.updated(tok, 1L)
      case None =>
        // Full and new: decrement every counter, drop zeros (the
        // classic MG step — equivalent to cancelling c+1 distinct
        // items against each other).
        m.flatMap { case (k, v) => if (v > 1) Some(k -> (v - 1)) else None }
    }
    (next, n + 1)
  }

  override def merge(a: (Map[String, Long], Long),
      b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val sum = b._1.foldLeft(a._1) { case (acc, (k, n)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + n)
    }
    val merged =
      if (sum.size <= c) sum
      else {
        // Subtract the (c+1)-th largest count from everything and keep
        // the strictly-positive survivors — the PODS'12 merge that
        // preserves the additive N/(c+1) error bound.
        val d = sum.valuesIterator.toArray.sortBy(-_).apply(c)
        sum.flatMap { case (k, n) => if (n > d) Some(k -> (n - d)) else None }
      }
    (merged, a._2 + b._2)
  }

  override def finish(buf: (Map[String, Long], Long)): MgSummary =
    MgSummary(buf._1.toSeq.sortBy { case (k, n) => (-n, k) }, buf._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder[(Map[String, Long], Long)]()
  override def outputEncoder: Encoder[MgSummary] =
    ExpressionEncoder[MgSummary]()
}

object MisraGriesAggregator {
  /** Column form for `Dataset[String].select(...)` global aggregation. */
  def mg(c: Int) = new MisraGriesAggregator(c).toColumn
}
