package graft
package operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators of the engine, expressed Spark-first so
  * Catalyst gets full pushdown / pruning / broadcast freedom.
  *
  * These are the engine analogues of the reference's storage/search SQL
  * surface (SURVEY.md §2.2-§2.7): metadata filters (F1-F5), the
  * documents⋈sources joins (J1-J3), anti-join GC shapes (S9/D4),
  * aggregations (A1-A8), window dedup (J6/W2), top-k (W1/O1-O4) and set
  * ops (U1-U5) — exercised here over the driver's TPC-H-ish tables.
  *
  * Float-determinism convention for the DuckDB oracle: 2-decimal money
  * columns are converted to integer cents (`CAST(ROUND(x*100) AS BIGINT)`)
  * before SUM so aggregation is order-independent and bit-exact across
  * engines; a final single division back to double is IEEE-deterministic.
  * Integer-valued doubles (l_quantity) sum exactly as doubles.
  */
object Relational {

  /** round-to-cents as exact integer — mirrors the oracle SQL expression. */
  private[graft] def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** A1/A2/A6-shape: single-pass grouped aggregation (the reference's
    * getStats ran 4 filtered counts — sqlite-storage-operations.ts:223-234;
    * this is the one-pass replacement). Pushdown: only 6 columns scanned. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        (sum(cents($"l_extendedprice")) / 100.0).as("sum_base_price"),
        (sum(cents($"l_extendedprice") * (lit(100) - cents($"l_discount")))
          / 10000.0).as("sum_disc_price"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  /** F1/F2/F5-shape: predicate + projection; both filters reach the
    * parquet scan as PushedFilters. */
  def qFilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_quantity" < 24)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        cents($"l_extendedprice").as("price_cents"))
      .orderBy($"l_orderkey", $"l_linenumber")

  /** J2/J3-shape: fact ⋈ broadcast dims chain (customer→nation→region),
    * like documents⟕sources enrichment. Dims are broadcast explicitly —
    * at 100 TB the fact side never shuffles for these joins. */
  def qJoinEnrich(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"),
        (sum(cents($"o_totalprice")) / 100.0).as("total_revenue"))
      .orderBy($"r_name", $"n_name")
  }

  /** W1/O1/O3-shape: global top-k with deterministic tie-break —
    * physical plan is TakeOrderedAndProject (no full sort/shuffle). */
  def qTopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(10)

  /** J6/W2-shape: dedupe keep-best per group (reference query-chain dedup
    * on (sourceId, chunkIndex) keeping max score — query-chain.ts:51-74). */
  def qWindowDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_extendedprice".desc, $"l_linenumber".asc)
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_orderkey")
  }

  /** Columns profiled by [[qTableStats]]. */
  private val StatsCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** ANALYZE-TABLE-style one-pass column profile of the documents
    * table — the statistics a cost-based optimizer (and this engine's
    * own planning heuristics: broadcast thresholds, salt decisions,
    * domain caps) feeds on: per column, row/null counts, total string
    * length, EXACT distinct count, and the KMV sketch estimate beside
    * it. Pairing exact ndv with the sketch is deliberate: at profile
    * scale the pair calibrates the sketch; on the 100 TB table only
    * the sketch column runs (same contract as
    * [[TextAnalysis.qKmvDistinct]], whose estimator and K this
    * reuses).
    *
    * Shape: the table is stacked to `(column, value)` rows — the same
    * Expand work a multi-`count(distinct)` ANALYZE plans — then ONE
    * distinct-keyed pass feeds ndv + the bounded MinK sketch, and the
    * base counts ride the stacked scan. Every shuffle key is
    * (column, value/hash): 5 well-spread groups, no wide rows, no
    * window. */
  def qTableStats(spark: SparkSession, dir: String): DataFrame =
    tableStatsOf(Tables.documents(spark, dir), StatsCols)

  /** [[qTableStats]]'s one-pass profile over an EXPLICIT frame and
    * column list — the form [[graft.store.ChunkStore.writeWithStats]]
    * attaches to any store write as the `_stats` sidecar. */
  private[graft] def tableStatsOf(df: DataFrame,
      cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.embed.Embedder.hash60Col
    val k = TextAnalysis.KmvK
    val stacked = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("cname"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select(col("e.cname").as("cname"), col("e.v").as("v"))
    val base = stacked.groupBy("cname").agg(
      count(lit(1)).as("n"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      sum(length(coalesce(col("v"), lit("")))).as("sum_len"))
    val dh = stacked.filter(col("v").isNotNull).distinct()
      .select(col("cname"), hash60Col(col("v")).as("h"))
    // ndv and the KMV kth-min ride ONE aggregate over the distinct
    // table (udaf beside count) — the former two-consumer join
    // recomputed the stack + distinct lineage once per branch
    val ndvKth = dh.groupBy("cname")
      .agg(count(lit(1)).as("ndv"),
        graft.functions.MinKPairAggregator.minKUdaf(k)(
          col("h"), lit(0L)).as("mins"))
      .select(col("cname"), col("ndv"),
        when(size(col("mins")) >= k,
          element_at(col("mins"), k).getField("_1")).as("h_k"))
    base.join(ndvKth, "cname")
      .withColumn("ndv_kmv",
        when(col("h_k").isNull, col("ndv")).otherwise(expr(
          s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976 AS DECIMAL(38,0)) div h_k")))
      .select("cname", "n", "n_null", "sum_len", "ndv", "ndv_kmv")
      .orderBy("cname")
  }

  /** Anti-join shape (S9 source GC / D4 already-indexed check):
    * customers with no orders. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Semi-join shape (EXISTS): customers with at least one 1995 order. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1996-01-01").cast("timestamp"))
      .select($"o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** U1/U2-shape: union + distinct (multi-pattern file-set union). */
  def qSetUnion(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir).select($"s_nationkey".as("nationkey"))
      .union(Tables.customer(spark, dir).select($"c_nationkey".as("nationkey")))
      .distinct()
      .orderBy($"nationkey")

  /** U4-shape set difference over row sets: nations that have customers
    * but no suppliers. */
  def qSetExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select($"c_nationkey".as("nationkey"))
      .except(Tables.supplier(spark, dir).select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")

  /** U5-shape intersection over row sets: nations with BOTH customers
    * and suppliers (completes the union/except/intersect family). */
  def qSetIntersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select($"c_nationkey".as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")

  /** O2-shape: deterministic keyset-style pagination
    * (ORDER BY created_at DESC LIMIT ? OFFSET ? — reference list op). */
  def qPagination(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy($"o_orderdate".desc, $"o_orderkey".asc)
      .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
      .offset(50)
      .limit(100)

  /** A6/A7-shape: per-group descriptive stats. Variance computed from
    * exact integer sums (cents and cents²) so it is bit-stable across
    * engines regardless of aggregation order. */
  def qStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("vc", cents($"value"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        min($"value").as("min_value"),
        max($"value").as("max_value"),
        (sum($"vc") / 100.0).as("sum_value"),
        ((sum($"vc" * $"vc") / count(lit(1)) / 10000.0) -
          (sum($"vc") / count(lit(1)) / 100.0) *
          (sum($"vc") / count(lit(1)) / 100.0)).as("var_value"))
      .orderBy($"event_type")

  /** A7 exact ceil-rank percentiles (the reference's method,
    * score-analysis.ts:42-93: index = ceil(p·n), 1-based) — the emitted
    * value is an actual row value (exact).
    *
    * Scale shape: a per-event_type row_number over the events table
    * would put ~n/|event_types| rows in ONE window task. Instead the
    * cut values come from the (event_type, value) HISTOGRAM: `value`
    * is 2-decimal data on a bounded domain, so the histogram holds a
    * bounded number of rows per type however big the corpus is — the
    * cumulative-count window below sorts that bounded table, not
    * events. Each value's rank interval is (lo, cum]; the percentile
    * at cut rank r = max(ceil(n·p/100), 1) is the value whose interval
    * contains r. Only the VALUE at the rank is needed (ranks that land
    * mid-tie share one value), so no corpus join-back is required at
    * all — same technique as [[graft.operators.Quality.qPplBucket]]
    * minus its boundary refinement. Bit-identical to the row_number
    * formulation (the oracle keeps it). */
  def qPercentile(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy($"event_type").orderBy($"value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = Tables.events(spark, dir)
      .groupBy($"event_type", $"value")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(wCum))
      .withColumn("n", sum($"c").over(Window.partitionBy($"event_type")))
      .withColumn("lo", $"cum" - $"c")
    val pcts = Seq(25, 50, 75, 90)
    val agg = pcts.map { p =>
      val r = greatest(ceil($"n" * p / 100.0), lit(1))
      max(when($"lo" < r && r <= $"cum", $"value")).as(s"p$p")
    }
    hist.groupBy($"event_type").agg(agg.head, agg.tail: _*)
      .orderBy($"event_type")
  }

  /** A8-shape: histogram bucketing (10 buckets of 50) + 3-class split
    * (high/medium/low score distribution, score-analysis.ts:98-143). */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("bucket", floor($"value" / 50).cast("long"))
      .withColumn("band",
        when($"value" >= 400, "high")
          .when($"value" >= 250, "medium")
          .otherwise("low"))
      .groupBy($"bucket", $"band")
      .agg(count(lit(1)).as("n"))
      .orderBy($"bucket", $"band")

  /** Tumbling time-window aggregation over the events table (batch
    * analogue of the streaming path; see graft.streaming for the
    * readStream version). */
  def qTimeWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("hour", date_trunc("hour", $"ts"))
      .groupBy($"hour", $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"value")) / 100.0).as("sum_value"))
      .orderBy($"hour", $"event_type")

  /** Hierarchical rollup totals — subtotal rows per returnflag and a
    * grand total (beyond the reference's flat GROUP BYs; Spark and
    * DuckDB share ROLLUP semantics). Null group keys are coalesced to
    * 'ALL' so the compare is text-stable. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"l_extendedprice")) / 100.0).as("sum_price"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_price")
      .orderBy("returnflag", "linestatus")

  /** TPC-H Q3-shape shipping priority: selective filters pushed to
    * both fact scans, dimension broadcast, top-10 revenue groups —
    * the canonical selective multi-join. Revenue in exact cents. */
  def qShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1995-03-15").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val o = Tables.orders(spark, dir)
      .filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val l = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > cut)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg((sum(cents($"l_extendedprice") * (lit(100) - cents($"l_discount")))
        / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), $"l_orderkey")
      .limit(10)
  }

  /** Full cube over two dimensions (every grouping-set combination). */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity").as("sum_qty"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_qty")
      .orderBy("returnflag", "linestatus")

  /** Explicit GROUPING SETS — an irregular set combination (detail,
    * per-linestatus subtotal, grand total) that neither rollup nor cube
    * expresses; Spark 4's `Dataset.groupingSets` lowers it to the same
    * single Expand+Aggregate plan both engines share semantics for. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_linestatus"), Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"l_extendedprice")) / 100.0).as("sum_price"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"n", $"sum_price")
      .orderBy("returnflag", "linestatus")

  /** Registry consumed by [[graft.SparkEntry]]. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_stats"   -> (qTableStats _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_ship_priority" -> (qShipPriority _),
    "q_cube"         -> (qCube _),
    "q_rollup"       -> (qRollup _),
    "q1_agg"         -> (q1Agg _),
    "q_filter_project" -> (qFilterProject _),
    "q_join_enrich"  -> (qJoinEnrich _),
    "q_topk"         -> (qTopK _),
    "q_window_dedup" -> (qWindowDedup _),
    "q_anti_join"    -> (qAntiJoin _),
    "q_semi_join"    -> (qSemiJoin _),
    "q_set_union"    -> (qSetUnion _),
    "q_set_except"   -> (qSetExcept _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_pagination"   -> (qPagination _),
    "q_stats"        -> (qStats _),
    "q_percentile"   -> (qPercentile _),
    "q_histogram"    -> (qHistogram _),
    "q_time_window"  -> (qTimeWindow _),
  )

  /** DuckDB-equivalent SQL, mirroring each query's arithmetic exactly
    * (same cents-integer trick, same tie-breaks) for hash-stable compare. */
  val oracles: Map[String, String] = Map(
    "q_table_stats" ->
      s"""WITH stacked AS (
        |  SELECT 'doc_id' AS cname, CAST(doc_id AS VARCHAR) AS v FROM documents
        |  UNION ALL SELECT 'text', text FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents),
        |base AS (
        |  SELECT cname, count(*) AS n,
        |    sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |    sum(length(coalesce(v, '')))::BIGINT AS sum_len
        |  FROM stacked GROUP BY 1),
        |dh AS (SELECT DISTINCT cname, v FROM stacked WHERE v IS NOT NULL),
        |dhh AS (SELECT cname, ('0x'||substr(md5(v),1,15))::BIGINT AS h FROM dh),
        |nd AS (SELECT cname, count(*) AS ndv FROM dhh GROUP BY 1),
        |rk AS (SELECT cname, h,
        |    row_number() OVER (PARTITION BY cname ORDER BY h) AS rn FROM dhh),
        |kth AS (SELECT cname, h AS h_k FROM rk WHERE rn = ${TextAnalysis.KmvK})
        |SELECT b.cname, b.n, b.n_null, b.sum_len, nd.ndv,
        |  CASE WHEN k.h_k IS NULL THEN nd.ndv
        |    ELSE ((${TextAnalysis.KmvK - 1}::HUGEINT * 1152921504606846976::HUGEINT)
        |          // k.h_k)::BIGINT END AS ndv_kmv
        |FROM base b JOIN nd USING (cname) LEFT JOIN kth k USING (cname)
        |ORDER BY cname""".stripMargin,
    "q_ship_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  sum(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)))/10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  sum(CAST(ROUND(l_extendedprice*100,0) AS BIGINT))/100.0 AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n,
        |  sum(CAST(ROUND(l_extendedprice*100,0) AS BIGINT))/100.0 AS sum_price
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(CAST(ROUND(l_extendedprice*100,0) AS BIGINT))/100.0 AS sum_base_price,
        |  sum(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)
        |      * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)))/10000.0 AS sum_disc_price,
        |  sum(l_quantity)/count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS price_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_join_enrich" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  sum(CAST(ROUND(o_totalprice*100,0) AS BIGINT))/100.0 AS total_revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_window_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_set_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT s_nationkey AS nationkey FROM supplier
        |  UNION ALL SELECT c_nationkey FROM customer)
        |ORDER BY nationkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_pagination" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 100 OFFSET 50""".stripMargin,
    "q_stats" ->
      """SELECT event_type, count(*) AS n, min(value) AS min_value,
        |  max(value) AS max_value,
        |  sum(vc)/100.0 AS sum_value,
        |  (sum(vc*vc)/count(*)/10000.0)
        |    - (sum(vc)/count(*)/100.0)*(sum(vc)/count(*)/100.0) AS var_value
        |FROM (SELECT event_type, value,
        |        CAST(ROUND(value*100,0) AS BIGINT) AS vc FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_percentile" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type,
        |  max(CASE WHEN rn = greatest(CAST(ceil(n*25/100.0) AS BIGINT),1) THEN value END) AS p25,
        |  max(CASE WHEN rn = greatest(CAST(ceil(n*50/100.0) AS BIGINT),1) THEN value END) AS p50,
        |  max(CASE WHEN rn = greatest(CAST(ceil(n*75/100.0) AS BIGINT),1) THEN value END) AS p75,
        |  max(CASE WHEN rn = greatest(CAST(ceil(n*90/100.0) AS BIGINT),1) THEN value END) AS p90
        |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(value/50) AS BIGINT) AS bucket,
        |  CASE WHEN value >= 400 THEN 'high'
        |       WHEN value >= 250 THEN 'medium' ELSE 'low' END AS band,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY bucket, band""".stripMargin,
    "q_time_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  sum(CAST(ROUND(value*100,0) AS BIGINT))/100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
  )
}
