package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass Gram/covariance accumulation over fixed-point embedding
  * vectors: buffer = (row count, per-dim sums, upper-triangle pair
  * sums) — `dim + dim·(dim+1)/2` longs, CONSTANT in the corpus size.
  * Spark runs it with map-side partial aggregation, so each partition
  * ships one bounded summary instead of any per-row state, and the
  * merge is element-wise addition (associative + commutative ⇒ the
  * result is partitioning- and order-invariant, which is what lets a
  * DuckDB oracle reproduce it bit-for-bit).
  *
  * Inputs are fixed-point longs (the caller scales floats by 1e3), so
  * every sum is EXACT integer arithmetic: per-row pair terms are
  * ≤ 1e6, leaving ~9e12 rows of headroom in a signed 64-bit sum —
  * enough for any single corpus this engine targets; past that the
  * caller widens to per-shard sketches merged in DECIMAL.
  *
  * The pair order is row-major upper triangle: (0,0),(0,1),…,(0,d-1),
  * (1,1),… — [[finish]] re-emits it as explicit (i, j, sum) triples so
  * the query side never re-derives triangular indexing.
  */
class GramAggregator(dim: Int)
    extends Aggregator[Seq[Long], (Long, Seq[Long], Seq[Long]),
      (Long, Seq[Long], Seq[(Int, Int, Long)])] {

  private val nPairs = dim * (dim + 1) / 2

  override def zero: (Long, Seq[Long], Seq[Long]) =
    (0L, Seq.fill(dim)(0L), Seq.fill(nPairs)(0L))

  override def reduce(b: (Long, Seq[Long], Seq[Long]),
      x: Seq[Long]): (Long, Seq[Long], Seq[Long]) = {
    val s = b._2.toArray
    val ss = b._3.toArray
    val v = x.toArray
    var i = 0
    var k = 0
    while (i < dim) {
      s(i) += v(i)
      var j = i
      while (j < dim) {
        ss(k) += v(i) * v(j)
        j += 1
        k += 1
      }
      i += 1
    }
    (b._1 + 1, s.toSeq, ss.toSeq)
  }

  override def merge(a: (Long, Seq[Long], Seq[Long]),
      b: (Long, Seq[Long], Seq[Long])): (Long, Seq[Long], Seq[Long]) =
    (a._1 + b._1,
      a._2.zip(b._2).map { case (x, y) => x + y },
      a._3.zip(b._3).map { case (x, y) => x + y })

  override def finish(b: (Long, Seq[Long], Seq[Long])):
      (Long, Seq[Long], Seq[(Int, Int, Long)]) = {
    val triples = Seq.newBuilder[(Int, Int, Long)]
    var i = 0
    var k = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        triples += ((i, j, b._3(k)))
        j += 1
        k += 1
      }
      i += 1
    }
    (b._1, b._2, triples.result())
  }

  override def bufferEncoder: Encoder[(Long, Seq[Long], Seq[Long])] =
    ExpressionEncoder[(Long, Seq[Long], Seq[Long])]()
  override def outputEncoder:
      Encoder[(Long, Seq[Long], Seq[(Int, Int, Long)])] =
    ExpressionEncoder[(Long, Seq[Long], Seq[(Int, Int, Long)])]()
}

object GramAggregator {
  /** Column form for `Dataset.select(...)` (global aggregation). */
  def gram(dim: Int) = new GramAggregator(dim).toColumn
}
