package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries frequent-items summary (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012):
  * a typed `Aggregator` whose buffer is AT MOST `c` (token, count)
  * entries, however many rows flow through it. Spark runs it with
  * map-side partial aggregation, so each upstream partition ships one
  * bounded summary into the shuffle — the whole corpus is never
  * grouped by token.
  *
  * Guarantee (the one [[graft.operators.TextAnalysis.qHeavyHitters]]
  * builds on): for any item with true frequency > N/(c+1), the merged
  * summary still contains it — decrements are bounded by N/(c+1)
  * TOTAL across arbitrary merge trees, so a frequency above that
  * bound cannot reach zero. The summary is therefore a guaranteed
  * SUPERSET of the items at or above any threshold ≥ N/(c+1); an
  * exact count-verify pass over just those candidates turns the
  * sketch into an exact answer (the Bloom-prefilter-then-verify
  * pattern `q_bloom_decon` uses).
  *
  * Buffer entries are kept sorted by (count desc, token asc) only at
  * `finish`; internally a plain Map keeps reduce O(1) per row.
  */
class MisraGriesAggregator(c: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(c >= 1, s"counter budget out of range: $c")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(n) => buf.updated(tok, n + 1)
      case None if buf.size < c => buf.updated(tok, 1L)
      case None =>
        // Full and new: decrement every counter, drop zeros (the
        // classic MG step — equivalent to cancelling c+1 distinct
        // items against each other).
        buf.flatMap { case (k, n) => if (n > 1) Some(k -> (n - 1)) else None }
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, n)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + n)
    }
    if (sum.size <= c) sum
    else {
      // Subtract the (c+1)-th largest count from everything and keep
      // the strictly-positive survivors — the PODS'12 merge that
      // preserves the additive N/(c+1) error bound.
      val d = sum.valuesIterator.toArray.sortBy(-_).apply(c)
      sum.flatMap { case (k, n) => if (n > d) Some(k -> (n - d)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (k, n) => (-n, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object MisraGriesAggregator {
  /** Column form for `Dataset[String].select(...)` global aggregation. */
  def mg(c: Int) = new MisraGriesAggregator(c).toColumn
}
