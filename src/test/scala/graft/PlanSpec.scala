package graft

/** Physical-plan shape assertions for the headline queries — the plan
  * must stay "the one you'd want" (SURVEY.md §4), not just correct:
  * predicates at the scan, dims broadcast, top-k as
  * TakeOrderedAndProject, no accidental sort-merge joins. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  test("q_filter_project: all four predicates reach the parquet scan") {
    val p = planOf("q_filter_project")
    assert(p.contains("PushedFilters"))
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(p.contains(s"IsNotNull($c)"), s"missing pushdown for $c\n$p")
    }
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_quantity"))
    // pruned read schema — no full-width scan
    assert(!p.contains("l_comment"))
  }

  test("q_join_enrich: the dim chain is all broadcast joins") {
    val p = planOf("q_join_enrich")
    assert(p.split("BroadcastHashJoin").length >= 4, p) // 3 joins
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_topk: global top-k lowers to TakeOrderedAndProject") {
    assert(planOf("q_topk").contains("TakeOrderedAndProject"))
  }

  test("q_knn: query side broadcast, corpus side scanned once") {
    val p = planOf("q_knn")
    assert(p.contains("BroadcastExchange"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q1_agg: partial aggregation before the shuffle") {
    val p = planOf("q1_agg")
    // HashAggregate appears twice: partial (map-side) + final
    assert(p.split("HashAggregate").length >= 3, p)
  }

  test("q_collocations: unigram/total sides broadcast, no sort-merge join") {
    val p = planOf("q_collocations")
    assert(p.split("BroadcastHashJoin").length >= 3, p) // c_a, c_b joins
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.split("BroadcastExchange").length >= 3, p)      // the 1-row total
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_doc_keywords: df and corpus-size sides broadcast; top-k windowed") {
    val p = planOf("q_doc_keywords")
    assert(p.split("BroadcastHashJoin").length >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("q_inverted_index: postings from the bounded aggregator, " +
      "no per-term rank window") {
    val p = planOf("q_inverted_index")
    // a per-term row_number window would single-task-sort the hottest
    // term's full posting set (df ≈ |corpus| for stop-word-class terms)
    assert(!p.contains("Window"), p)
    assert(!p.contains("row_number"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("q_simhash_near: band join is a hash equi-join, not a cartesian") {
    val p = planOf("q_simhash_near")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_simhash_topk: capped serving twin — equi-join candidates, " +
      "bounded aggregator, no rank window") {
    val p = planOf("q_simhash_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the per-doc cap must come from the map-side bounded TopK buffer,
    // never a row_number window sorting a templated corpus's full
    // neighbor set in one task
    assert(!p.contains("Window"), p)
    assert(!p.contains("row_number"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("q_simhash_rep: exact-first composition — rep-level equi-join, " +
      "no cartesian, no window") {
    val p = planOf("q_simhash_rep")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // multiplicity comes from the fingerprint groupBy, never a window
    assert(!p.contains("Window"), p)
  }

  test("q_ann_tombstone: delete filtering is an id-keyed anti-join " +
      "before the top-k, not a post-filter") {
    val p = planOf("q_ann_tombstone")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), p)
    // the merged top-k still lowers after the anti-join
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_doc_maxsim: per-doc winner is an aggregate (no corpus " +
      "window), top-10 lowered") {
    val p = planOf("q_doc_maxsim")
    assert(!p.contains("CartesianProduct"), p)
    // best chunk per doc = max over (score, -chunk_index) struct — an
    // aggregate with map-side partials, never a rank window. (The
    // Window nodes that DO appear are sparseVectors' per-chunk norm
    // sums — keyed by chunk id, 1-64 rows per group, the same shape
    // every hashing-TF search query carries.)
    assert(!p.contains("row_number"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_search_rrf: rank windows run over LIMITed candidate lists, " +
      "not the corpus") {
    val p = planOf("q_search_rrf")
    assert(!p.contains("CartesianProduct"), p)
    // both fusion inputs are k-bounded before any window: the limits
    // must appear upstream in the plan
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"), p)
  }

  test("q_search_rrf_idx: both fusion arms ride session-cached " +
      "artifacts — no corpus text scan at query time") {
    val p = planOf("q_search_rrf_idx")
    assert(!p.contains("CartesianProduct"), p)
    // the only sort-merge join allowed is the FULL OUTER fusion of the
    // two ≤20-row rank lists (broadcast hash join does not support
    // full outer); the lexical rescore broadcasts its bounded
    // candidate set, so no inner join ever sorts the scoring table
    assert(!p.contains("SortMergeJoin Inner"), p)
    // three cached artifacts feed the fusion: the sparse doc vectors
    // (semantic arm), the impact index (candidate lists) and the BM25
    // scoring table (rescore) — every parquet scan in the plan sits
    // INSIDE an InMemoryRelation's build definition, paid once per
    // session, never per query
    assert(p.split("InMemoryTableScan").length >= 4, p)
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"), p)
  }

  test("q_c4_rules: single scan, row-local flags, no join, no window") {
    val p = planOf("q_c4_rules")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_pii_scrub: single scan, partial aggregation, no join") {
    val p = planOf("q_pii_scrub")
    assert(!p.contains("Join"), p)
    assert(p.split("HashAggregate").length >= 3, p)
  }

  test("q_kmeans_step: centroid recompute has map-side partial sums") {
    val p = planOf("q_kmeans_step")
    assert(p.split("HashAggregate").length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_gopher_rules: pure narrow projection — no shuffle, no join") {
    val p = planOf("q_gopher_rules")
    assert(!p.contains("Join"), p)
    // the only exchange allowed is the final orderBy's range partitioning
    assert(!p.contains("hashpartitioning"), p)
  }

  test("q_substr_dedup: gram stats come from a window, not a join-back") {
    val p = planOf("q_substr_dedup")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("q_vocab_oov / q_dsir_proxy: term tables broadcast, no sort-merge join") {
    Seq("q_vocab_oov", "q_dsir_proxy").foreach { q =>
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"), s"$q\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q\n$p")
    }
  }

  test("q_funnel: user-keyed equi-joins only, no event cross product") {
    val p = planOf("q_funnel")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_ppl_bucket: terciles from the score histogram — no doc-level " +
      "per-language ntile sort") {
    val p = planOf("q_ppl_bucket")
    assert(!p.contains("ntile"), p)
    // boundary refinement joins the ≤2-row straddle table by broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_percentile: cut values from the value histogram — no per-type " +
      "row_number over events") {
    val p = planOf("q_percentile")
    // the window must run over the bounded (event_type, value) histogram
    // (aggregate keyed on both), never rank raw events
    assert(!p.contains("row_number"), p)
    assert(p.contains("Keys [2]: [event_type#"), p)
  }

  test("q_ntile: quartiles from the value histogram — no per-type " +
      "ntile sort over events") {
    val p = planOf("q_ntile")
    assert(!p.contains("ntile"), p)
    assert(p.contains("Keys [2]: [event_type#"), p)
  }

  test("q_bpe_pairs: pair counting rides the vocab table — no window, " +
      "top-20 lowered") {
    val p = planOf("q_bpe_pairs")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_unimax_alloc: waterfill window runs over the languages-sized " +
      "aggregate, never documents") {
    val p = planOf("q_unimax_alloc")
    // the only aggregate below the window is keyed on lang — the
    // window's input is the per-language table, not the corpus
    assert(p.contains("Keys [1]: [lang#"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_seq_len_hist: sweep runs over the bounded token histogram, " +
      "not documents") {
    val p = planOf("q_seq_len_hist")
    assert(!p.contains("Window"), p)
    // the corpus reduces to a (n_tokens, count) histogram first; the
    // context-length sweep aggregates THAT, keyed on ctx_len
    assert(p.contains("Keys [1]: [n_tokens#"), p)
    assert(p.contains("Keys [1]: [ctx_len#"), p)
  }

  test("q_ann_delta: merged top-10 lowered, no cartesian blowup") {
    val p = planOf("q_ann_delta")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_label_noise: rides the bounded knn join — no rank window, " +
      "no cartesian") {
    val p = planOf("q_label_noise")
    assert(!p.contains("row_number"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_emb_outliers: bottom-10 lowered to TakeOrderedAndProject") {
    val p = planOf("q_emb_outliers")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_mine_bitext: bucket-mate candidates only, bounded top-k, " +
      "no cartesian") {
    val p = planOf("q_mine_bitext")
    assert(!p.contains("CartesianProduct"), p)
    // both neighborhoods ride the bounded aggregator, not rank windows
    assert(!p.contains("row_number"), p)
    // global top-20 lowers to TakeOrderedAndProject
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_semdedup: keep-best is an argmax aggregate, no per-component " +
      "rank window") {
    val p = planOf("q_semdedup")
    // a row_number window over grp would put a giant duplicate
    // cluster in one task; the argmax aggregate partial-reduces it
    assert(!p.contains("row_number"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_pack_batches: cumsum windows are segment-bounded, never " +
      "whole-shard") {
    val p = planOf("q_pack_batches")
    // a windowspec partitioned by source alone and ordered by doc_id
    // would make a giant shard one task; both windows must carry the
    // bounding segment key (carry: partition source order seg;
    // local: partition source,seg order doc_id)
    assert(!"windowspecdefinition\\(source#\\d+, doc_id#".r
      .findFirstIn(p).isDefined, p)
    assert("windowspecdefinition\\(source#\\d+, seg#".r
      .findFirstIn(p).isDefined, p)
  }

  test("q_sample_strat: bounded map-side top-k aggregate, no stratum window") {
    val p = planOf("q_sample_strat")
    assert(!p.contains("Window"), p)
    assert(!p.contains("row_number"), p)
    // winners table broadcast back to the scan for payload columns
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_curation_manifest: all three stage aggregates ride ONE docs scan") {
    def docScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        .split("\n").count(_.contains("documents.parquet"))
    // the manifest layer may add exactly one corpus scan beyond what
    // its stage-verdict subqueries already cost (a per-stage recount
    // would add three)
    val components =
      docScans(operators.Quality.qFilterChain(spark, sfDir)) +
      docScans(operators.Dedup.componentLabels(spark, sfDir)) +
      docScans(operators.Dedup.qSemdedup(spark, sfDir))
    val manifest = docScans(SparkEntry.queries("q_curation_manifest")(spark, sfDir))
    assert(manifest === components + 1,
      s"manifest=$manifest components=$components")
  }

  test("q_line_dedup: partial aggregation, no window over the segment key") {
    val p = planOf("q_line_dedup")
    // owner = groupBy-min + join-back (map-side partial agg), NOT a
    // window over the corpus-wide segment key (single-task hot key)
    assert(p.split("HashAggregate").length >= 3, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_kmv_distinct: no per-language sort or window") {
    val p = planOf("q_kmv_distinct")
    // the K minima come from the bounded aggregator, never from a
    // per-stratum row_number window (dominant-language single task)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_heavy_hitters: bounded MG sketch, candidates broadcast, " +
      "no token window") {
    val p = planOf("q_heavy_hitters")
    // pass 1 is the typed Misra–Gries aggregator (ObjectHashAggregate
    // with map-side partial), pass 2 exact-counts only the broadcast
    // candidate set — never a groupBy/window over the full token
    // distribution feeding a sort
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_shard_plan: rank windows are segment-bounded, never a " +
      "corpus-wide sort task") {
    val p = planOf("q_shard_plan")
    // the global rank must come from carry-in + a seg-partitioned
    // window; a bare `row_number() OVER (ORDER BY h)` would funnel the
    // corpus through one task
    assert("windowspecdefinition\\(seg#\\d+L?, h#".r
      .findFirstIn(p).isDefined, p)
    assert(!"windowspecdefinition\\(h#".r.findFirstIn(p).isDefined, p)
  }

  test("q_cluster_cap: per-cell top-K from the bounded aggregator — " +
      "no cell-keyed rank window") {
    val p = planOf("q_cluster_cap")
    // the cached assignment's per-VECTOR window is fine
    // (high-cardinality key, 8-row groups); a per-CELL window would
    // make a mega-cluster one sort task
    assert(!"windowspecdefinition\\(cell#".r.findFirstIn(p).isDefined, p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("q_hard_negatives / q_knn_join: bounded aggregator, no rank window") {
    Seq("q_hard_negatives", "q_knn_join").foreach { q =>
      val p = planOf(q)
      // top-k comes from the typed bounded-buffer aggregator (object
      // hash aggregate), never a per-group row_number sort
      assert(!p.contains("Window"), s"$q:\n$p")
      assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
        s"$q:\n$p")
    }
  }

  test("q_ann_ivfpq: lookup tables broadcast, top-k lowered") {
    val p = planOf("q_ann_ivfpq")
    // probe cells + PQ lookup table + query vector are all broadcast;
    // the codes⋈members equi-join has no static stats (both derived),
    // so its strategy is AQE's runtime call — not pinned here
    assert(p.split("BroadcastExchange").length >= 4, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_bloom_decon: bloom prefilter sits ahead of the verify join") {
    val p = planOf("q_bloom_decon")
    // the corpus side is Filter(UDF) before any join
    assert(p.contains("Filter"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_weighted_sample: bounded MinK race, no stratum window") {
    val p = planOf("q_weighted_sample")
    // the E-S race rides the bounded map-side aggregator like
    // q_sample_strat; winners broadcast back
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_corpus_diff: narrow fingerprint projections feed the one " +
      "full-outer join") {
    val p = planOf("q_corpus_diff")
    // full-outer on two corpus-sized sides: sort-merge IS the right
    // plan; what must NOT happen is carrying text through the join
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    // text is consumed at the two scan-side projections (md5 + token
    // size), so the join payload stays narrow
    assert(p.split("md5").length >= 3, p)
  }

  test("q_nb_classifier: model joins broadcast, argmax is an " +
      "aggregate, no rank window") {
    val p = planOf("q_nb_classifier")
    // the V×C model table and the C-row class/prior/unseen tables are
    // all broadcast; scoring never sort-merges on the Zipf word key
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_bpe_encode: vocab joins back by broadcast, no shuffle of " +
      "corpus text, no window") {
    val p = planOf("q_bpe_encode")
    // the distinct-word token table is the broadcast side; the corpus
    // pass must never sort-merge on the Zipf-skewed word key
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bounded-aggregator queries stay object-boundary-free: no " +
      "DeserializeToObject ahead of the top-k/min-k aggregate") {
    // the typed groupByKey route materialized every input row as a
    // Scala tuple before the aggregate; the udaf forms must keep the
    // full upstream (joins, projections) in Tungsten rows
    Seq("q_knn_join", "q_kmv_distinct", "q_inverted_index",
        "q_cluster_cap", "q_domain_cap", "q_sample_strat",
        "q_weighted_sample", "q_table_stats", "q_simhash_topk",
        "q_quantile_sketch", "q_mine_bitext").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("DeserializeToObject"),
        s"$q re-grew an object boundary:\n$p")
      assert(!p.contains("MapGroups"), s"$q plans a MapGroups:\n$p")
    }
  }

  test("q_train_order: the only window is shard-partitioned — the " +
      "global-order window never exists") {
    val p = planOf("q_train_order")
    assert(p.contains("Window"), "expected the per-shard row_number")
    assert(p.matches(
      "(?s).*windowspecdefinition\\(shard#\\d+L, shuffle_key.*"),
      s"the row_number window is not shard-partitioned:\n$p")
    assert(!p.contains("windowspecdefinition(shuffle_key"),
      s"a corpus-wide (shard-free) window appeared:\n$p")
  }

  test("q_trunc_recall: every prefix arm lowers its top-k to " +
      "TakeOrderedAndProject — no corpus-wide rank window") {
    val p = planOf("q_trunc_recall")
    assert(p.contains("TakeOrderedAndProject"),
      s"prefix arms lost the TakeOrdered lowering:\n$p")
    assert(!p.contains("Window"),
      s"a rank window appeared in the truncation eval:\n$p")
  }
}
