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
}
