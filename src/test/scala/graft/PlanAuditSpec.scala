package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Whole-registry physical-plan audit — the global tripwire behind
  * PlanSpec's per-operator pins: EVERY registered query is planned and
  * its physical tree checked, so a quadratic join sneaking into ANY
  * registry entry (a dropped equi-key, a broadcast hint lost in a
  * refactor) fails CI the moment it appears, not when a bench melts.
  *
  *  - `CartesianProduct` is banned outright: nothing in the registry
  *    may plan an unbroadcast cross product at any size.
  *  - `BroadcastNestedLoopJoin` must broadcast a PROVABLY BOUNDED
  *    side: the build subtree has to contain a global (keyless)
  *    aggregate, a literal local table, a bounded range, a limit/
  *    top-k, or a scan pinned to a k-bounded id predicate — the
  *    shapes every intentional `crossJoin(broadcast(...))` in the
  *    engine uses (1-row totals, k-row query/mask/cutoff sets,
  *    codebooks). An accidental non-equi join over two full
  *    relations has none of these on its build side and is flagged.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose BNLJ build side is bounded for reasons the textual
    * markers can't prove (e.g. a cached bounded artifact surfacing as
    * a bare InMemoryTableScan). Keep small; justify each. */
  private val acceptedByName: Set[String] = Set.empty

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    expanded +: expanded.children.flatMap(flatten)
  }

  private val boundedMarkers = Seq(
    "HashAggregate(keys=[]",        // global 1-row aggregate
    "SortAggregate(key=[]",
    "ObjectHashAggregate(keys=[]",
    "LocalTableScan",               // literal k-row frame
    "Scan OneRowRelation",
    "Range (",                      // spark.range mask/plane tables
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit"
  )

  /** A Filter pinning an id column to a SMALL literal (= k / < k,
    * k < 10000) bounds the broadcast to a fixed query/sample set —
    * the query-vector and bounded-brute-force shapes. The digit cap
    * matters: without it a `vec_id < 10000000` "bound" (no bound at
    * all on a real corpus) would silently pass the audit. */
  private val boundedFilterRe =
    """\(\w*(vec_id|doc_id|query_id|qid)#\d+L? (=|<|<=) \d{1,4}\)""".r

  /** Registry rows allowed to carry an UNPARTITIONED window — each
    * one's input is bounded by construction and pinned below; any
    * other registry query planning a keyless window is a single-task
    * corpus-wide sort and fails here. This is the tripwire that makes
    * GraftSession's WindowExec-logger silencing honest: the warning is
    * off JVM-wide, so a NEW unpartitioned window must be caught by
    * THIS audit, not by log noise. The value is the EXACT expected
    * keyless-WindowExec count in that query's physical plan — a
    * refactor adding one MORE keyless window to an already-allowlisted
    * query fails the audit too, instead of hiding behind the
    * allowlist. */
  private val boundedWindowQueries: Map[String, Int] =
    Map("q_pq_balance" -> 1, "q_unimax_alloc" -> 2, "q_shard_plan" -> 1,
      "q_search_rrf" -> 2, "q_search_rrf_idx" -> 2)

  test("registry-wide: no CartesianProduct; every nested-loop join " +
      "broadcasts a provably bounded side; keyless WindowExec counts " +
      "match the audited allowlist exactly, zero elsewhere") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val nodes = flatten(fn(spark, sfDir).queryExecution.executedPlan)
        val carts = nodes.filter(_.nodeName.contains("CartesianProduct"))
          .map(_ => s"$name: CartesianProduct")
        val keyless = nodes.count {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            w.partitionSpec.isEmpty
          case _ => false
        }
        val badWindows = boundedWindowQueries.get(name) match {
          case Some(expected) if keyless == expected => Nil
          case Some(expected) => Seq(
            s"$name: $keyless unpartitioned WindowExec nodes, " +
              s"allowlist pins exactly $expected — a new keyless " +
              "window slipped into an allowlisted query (or one was " +
              "removed; update the pin with its input bound)")
          case None if keyless == 0 => Nil
          case None => Seq(
            s"$name: unpartitioned WindowExec (single-task sort " +
              "of the whole input — partition it or add the query " +
              "to boundedWindowQueries with a pinned input bound)")
        }
        val badBnlj =
          if (acceptedByName.contains(name)) Nil
          else nodes.collect {
            case j: BroadcastNestedLoopJoinExec =>
              val side = j.buildSide match {
                case BuildLeft  => j.left
                case BuildRight => j.right
              }
              val s = side.treeString
              if (boundedMarkers.exists(s.contains) ||
                  boundedFilterRe.findFirstIn(s).isDefined) None
              else Some(s"$name: BroadcastNestedLoopJoin over an " +
                s"unproven build side:\n$s")
          }.flatten
        carts ++ badWindows ++ badBnlj
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the deliberate unpartitioned windows run over tables " +
      "bounded by construction (the bound GraftSession's WindowExec " +
      "logger filter relies on)") {
    import org.apache.spark.sql.functions._
    // qPqBalance (Ann.scala): one row per embedding dimension
    val dims = operators.Ann.qEmbCov(spark, sfDir)
      .filter(col("i") === col("j")).count()
    assert(dims <= 64, s"PQ balance window input grew past dims: $dims")
    // qUnimaxAlloc (Curation.scala): one row per language
    val langs = Tables.documents(spark, sfDir)
      .select("lang").distinct().count()
    assert(langs <= 64, s"UniMax waterfill input grew past langs: $langs")
    // shardAssignments carry (Curation.scala): segment space is a
    // hash-range constant — 2^60 ids / ShardSegDiv residue classes
    assert((1L << 60) / operators.Curation.ShardSegDiv <= 4096L,
      "shard segment space outgrew the 4096-row carry-window bound")
    // RRF fusion rank windows (Search.scala): each arm is a bounded
    // top-N list — the semantic arm by an explicit limit(20), the
    // lexical arm by the BM25/impact top-k row count
    assert(operators.Search.qSearchBm25(spark, sfDir).count() <= 20,
      "RRF lexical arm outgrew its bounded-window assumption")
    assert(operators.Search.qImpactTopk(spark, sfDir).count() <= 20,
      "RRF impact arm outgrew its bounded-window assumption")
  }
}
