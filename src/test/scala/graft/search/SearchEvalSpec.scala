package graft
package search

import org.apache.spark.sql.functions._

import graft.operators.{Search, TextAnalysis}

/** Retrieval-quality metrics: bounds, internal consistency, and the
  * lexical ground truth recomputed independently per query. */
class SearchEvalSpec extends SparkSpec {

  test("q_search_eval: metric bounds and independent relevance counts") {
    val rows = Search.qSearchEval(spark, sfDir).collect()
    assert(rows.length === Search.FanoutQueries.length)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSet))
    rows.foreach { r =>
      val qid = r.getLong(0)
      val terms = Search.FanoutQueries.find(_._1 == qid).get._2
        .split(" ").toSet
      // independent ground truth: docs containing every query term
      val expectRel = docs.count(d => terms.subsetOf(d._2)).toLong
      assert(r.getLong(1) === expectRel, s"qid $qid n_relevant")
      val (nRel, hits, rec, prec, mrr) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(hits <= math.min(10L, nRel))
      assert(rec >= 0 && rec <= 1000000L)
      assert(prec >= 0 && prec <= 1000000L)
      assert(prec === hits * 1000000L / 10)
      if (nRel > 0) assert(rec === hits * 1000000L / nRel)
      // MRR: zero iff no hit; otherwise 1e6/rank for a rank in [1,10]
      if (hits == 0) assert(mrr === 0L)
      else assert((1 to 10).map(1000000L / _).contains(mrr))
    }
    // the eval must not be degenerate on this corpus: at least one
    // query finds a relevant doc in its top-10
    assert(rows.exists(_.getLong(2) > 0))
  }
}
