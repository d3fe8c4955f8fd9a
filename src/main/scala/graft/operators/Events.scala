package graft
package operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: JSON property
  * extraction (reference X9/F2 — metadata lives as JSON text in the
  * reference store, filtered via `json_extract`,
  * `src/core/vector-db/utils/filter.ts:52-100`), gap-based
  * sessionization, and an as-of join — the two classic operators Spark
  * has no primitive for, composed from windows exactly as SURVEY.md
  * §2's guidance prefers (compose > custom plan node).
  *
  * Scale notes: sessionization and as-of are one shuffle each
  * (partition by user), then narrow window scans; all timestamp
  * arithmetic is integer milliseconds so results are engine-exact.
  */
object Events {

  /** The generator's closed set of event types — single source of
    * truth for the pivot column list and the unpivot stack expression
    * (both diverge from their all-types DuckDB oracles if the data
    * ever grows a sixth type; EventsSpec asserts the table matches). */
  private[graft] val EventTypes =
    Seq("click", "error", "purchase", "signup", "view")

  /** X9/F2: JSON property extraction + pushdown-style predicate, then
    * grouped aggregation over the extracted value. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k") >= 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Gap-based sessionization: a >30-minute silence per user starts a
    * new session; emits per-session bounds and exact-cents value sums. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("gap",
        when(col("ms") - lag(col("ms"), 1).over(byUser) > 30L * 60 * 1000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("gap")).over(byUser))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (sum(Relational.cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** As-of join, composed: for every purchase, the most recent view at
    * or before it (per user) — union-tag + last(ignoreNulls) window,
    * no custom plan node needed. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("view_ts",
        last(when(col("event_type") === "view", col("ts")), ignoreNulls = true)
          .over(w))
      .withColumn("view_value",
        last(when(col("event_type") === "view", col("value")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase" && col("view_ts").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("view_ts"), col("view_value"))
      .orderBy("user_id", "event_id")
  }

  /** UNPIVOT (melt) — the inverse reshape of [[qPivot]], via Spark's
    * codegen'd `stack` expression: the wide per-user count matrix back
    * to long `(user_id, event_type, n)` rows, zero cells dropped (the
    * sparse long form). Round-trips [[qPivot]] exactly — the spec pins
    * melt(pivot(events)) against the plain groupBy — and stays
    * row-local after the pivot's aggregate: stack emits 5 rows per
    * input row inside the same stage, no extra shuffle. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    qPivot(spark, dir)
      .select(col("user_id"), expr(
        s"stack(${EventTypes.size}, " +
          EventTypes.map(t => s"'$t', $t").mkString(", ") +
          ") AS (event_type, n)"))
      .filter(col("n") > 0)
      .orderBy("user_id", "event_type")

  /** RANGE (band) JOIN — every purchase joined to the clicks within
    * ±30 minutes, with NO shared equi-key: the inequality-join shape
    * Spark would otherwise plan as a quadratic
    * BroadcastNestedLoopJoin over two corpus-sized sides (the exact
    * anti-pattern PlanAuditSpec bans). The scale plan is the
    * banded-bucket rewrite (the interval-join strategy stream engines
    * implement natively): quantize time into band-width buckets,
    * replicate the click side into its 3 adjacent buckets (explode
    * ×3), and the band predicate becomes an EQUI-join on bucket plus
    * a residual |Δt| filter in the join condition — shuffle volume
    * 3·|clicks| + |purchases|, each matching pair colliding in
    * exactly one replica bucket (purchase bucket ∈ {cb−1, cb, cb+1}
    * uniquely), so no post-join dedup. Left-outer keeps zero-match
    * purchases with exact-zero aggregates. At 100 TB bucket width =
    * band width keeps replication at a constant 3× regardless of
    * band/data ratio, and the bucket key is uniform in event time —
    * no skew beyond real traffic bursts (which q_key_skew measures). */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bandMs = 30L * 60 * 1000
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_millis(col("ts")).as("pms"))
      .withColumn("bucket", expr(s"pms div $bandMs"))
    val c = ev.filter(col("event_type") === "click")
      .select(unix_millis(col("ts")).as("cms"),
        Relational.cents(col("value")).as("cv"))
      .withColumn("b0", expr(s"cms div $bandMs"))
      .select(explode(array(col("b0") - 1, col("b0"), col("b0") + 1))
        .as("cbucket"), col("cms"), col("cv"))
    p.join(c, col("bucket") === col("cbucket") &&
        abs(col("cms") - col("pms")) <= bandMs, "left")
      .groupBy("event_id")
      .agg(count(col("cms")).as("n_clicks"),
        coalesce(sum(col("cv")), lit(0L)).as("click_cents"))
      .orderBy("event_id")
  }

  /** Pivot: per-user event-type counts as columns (reshape family the
    * reference lacks; conditional-aggregation form so the oracle is
    * plain SQL). */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = EventTypes
    Tables.events(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy("user_id")
  }

  /** Frame-spec running aggregates per user: cumulative exact-cents
    * value sum + 4-row moving average (cents-int mean, single
    * division). The reference uses no window frames at all
    * (SURVEY.md §2.5) — this exceeds its surface. */
  def qRunningWindow(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val move = order.rowsBetween(-3, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("user_id") < 50)
      .withColumn("vc", Relational.cents(col("value")))
      .select(col("user_id"), col("event_id"), col("ts"),
        (sum(col("vc")).over(cum) / 100.0).as("running_total"),
        round(sum(col("vc")).over(move).cast("double") /
          count(lit(1)).over(move) / 100.0, 6).as("moving_avg4"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** ntile quartiles by value within event type + per-tile stats.
    *
    * Scale shape: `ntile(4)` over a per-event_type window makes the
    * hottest event_type ONE task totally sorting its ~n/|types| rows.
    * But every emitted statistic (count, min, max per quartile) is a
    * function of the VALUE distribution alone — ntile's event_id
    * tie-break only shuffles identical values between adjacent
    * quartiles — so the whole answer comes from the bounded
    * (event_type, value) HISTOGRAM (2-decimal domain; same technique
    * as [[graft.operators.Quality.qPplBucket]]). Each value's rank
    * interval is (lo, cum]; ntile's exact bucket boundaries are
    * b_k = k·(n div 4) + min(n mod 4, k); a value contributes
    * overlap(lo, cum, b_{q-1}, b_q) rows to quartile q. The window
    * below runs over the histogram, never over events; the 4-way
    * explode multiplies the bounded histogram only. Bit-identical to
    * the ntile formulation (the oracle keeps it). */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
      .withColumn("lo", col("cum") - col("c"))
    hist
      .select(col("event_type"), col("value"), col("cum"), col("n"), col("lo"),
        explode(sequence(lit(1), lit(4))).as("quartile"))
      .withColumn("b_lo",
        expr("(quartile - 1) * (n div 4) + least(n % 4, quartile - 1L)"))
      .withColumn("b_hi",
        expr("quartile * (n div 4) + least(n % 4, cast(quartile as bigint))"))
      .withColumn("k",
        least(col("cum"), col("b_hi")) - greatest(col("lo"), col("b_lo")))
      .filter(col("k") > 0)
      .groupBy("event_type", "quartile")
      .agg(sum(col("k")).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("event_type", "quartile")
  }

  /** Pearson correlation between event value and the JSON `k`
    * property per event type — every sum an exact integer (value in
    * cents, k as-is); the final formula is a fixed sequence of double
    * ops, so the result is engine-exact without relying on either
    * engine's `corr` accumulation order. */
  def qCorr(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("x", Relational.cents(col("value")))
      .withColumn("y", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      .withColumn("corr_vk",
        round(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6))
      .select("event_type", "n", "corr_vk")
      .orderBy("event_type")

  private val FunnelWindowMs = 86400000L // each step must follow within 24h

  /** Ordered-step funnel view → click → purchase: step k counts users
    * whose earliest qualifying event strictly follows their step-k−1
    * time within a 24-hour window. Emits one row per step with the
    * conversion fraction from the previous step. Each stage is a
    * user-keyed min-aggregate plus a user-keyed join — the corpus
    * shuffles once per step on the user key (150 users here; billions
    * of users partition uniformly), never on an event cross product. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ms").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ms") > col("t1") && col("ms") <= col("t1") + FunnelWindowMs)
      .groupBy("user_id").agg(min("ms").as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ms") > col("t2") && col("ms") <= col("t2") + FunnelWindowMs)
      .groupBy("user_id").agg(min("ms").as("t3"))
    val n = v.agg(count(lit(1)).as("n1"))
      .crossJoin(c.agg(count(lit(1)).as("n2")))
      .crossJoin(p.agg(count(lit(1)).as("n3")))
    // empty-stage guard: both engines must agree on 0-denominator
    // conversions (Spark div-by-zero → NULL, DuckDB 0.0/0.0 → NaN),
    // so pin NULL on both sides (oracle uses NULLIF)
    def conv(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den, 6))
        .otherwise(lit(null).cast("double"))
    n.select(lit(1L).as("step"), lit("view").as("stage"),
        col("n1").as("n_users"), lit(1.0).as("conv"))
      .unionByName(n.select(lit(2L).as("step"), lit("click").as("stage"),
        col("n2").as("n_users"), conv(col("n2"), col("n1")).as("conv")))
      .unionByName(n.select(lit(3L).as("step"), lit("purchase").as("stage"),
        col("n3").as("n_users"), conv(col("n3"), col("n2")).as("conv")))
      .orderBy("step")
  }

  /** Daily retention cohorts: users grouped by first-activity day,
    * fraction still active at day offsets 0–7. Day indices are integer
    * epoch-millis floor-division (engine-portable; no calendar logic).
    * Shape: user-keyed min for the cohort, distinct (user, offset)
    * activity, one (cohort, offset) groupBy — all linear, keys
    * uniform. The table every training-data freshness dashboard is
    * built from. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
    val cohort = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    val active = days.join(cohort, "user_id")
      .withColumn("offset", col("day") - col("cohort_day"))
      .filter(col("offset") <= 7)
      .select("user_id", "cohort_day", "offset")
      .distinct()
    val counts = active.groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_users"))
    val base = counts.filter(col("offset") === 0)
      .select(col("cohort_day"), col("n_users").as("n0"))
    counts.join(base, "cohort_day")
      .withColumn("retained",
        round(col("n_users").cast("double") / col("n0"), 6))
      .select("cohort_day", "offset", "n_users", "retained")
      .orderBy("cohort_day", "offset")
  }

  /** Bottom-k sample size for [[qQuantileSketch]]. */
  private[graft] val QsK = 128

  /** Audited percentile cuts for [[qQuantileSketch]]. */
  private[graft] val QsPcts = Seq(25, 50, 75, 90, 99)

  /** Mergeable QUANTILE sketch + its exact audit twin — the third
    * sketch in the engine's toolkit (cardinality =
    * [[TextAnalysis.qKmvDistinct]], frequency =
    * [[TextAnalysis.qHeavyHitters]], quantiles = here). The sketch is
    * a bottom-k uniform sample: per event_type, the [[QsK]] rows with
    * the smallest `hash60(event_id)` — a deterministic, ORDER- and
    * PARTITIONING-INVARIANT choice (the k-smallest of a fixed hash
    * multiset is the same whatever order rows arrive in), accumulated
    * by [[graft.functions.MinKPairAggregator]] with map-side partial
    * aggregation, so each upstream partition ships at most k pairs
    * per group however large the corpus. Quantile estimate at p =
    * ceil-rank over the sorted sample (the reference's ceil-rank
    * convention, score-analysis.ts:42-93, applied to the sample).
    *
    * The exact side reuses [[Relational.qPercentile]]'s bounded-histogram
    * technique (2-decimal domain ⇒ bounded distinct values per type)
    * and the query reports est vs exact with the absolute error — the
    * sketch-accuracy audit a pipeline runs at sample scale before
    * trusting the sketch alone on the 100 TB corpus, where the
    * bounded-domain assumption may not hold (free-form doubles) and
    * the bottom-k sample is the only shape whose state stays k·groups
    * regardless of the value domain. Every ordering the query relies
    * on is over bounded tables (≤[[QsK]] sample rows or the value
    * histogram per type); the percentile cut table is a 5-row literal
    * broadcast. */
  /** The `(event_type, hash, value-cents)` projection both the batch
    * sketch and its streaming twin sample from. */
  private[graft] def qsProjected(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        graft.embed.Embedder.hash60Col(col("event_id").cast("string")).as("h"),
        Relational.cents(col("value")).as("vc"))

  /** Ceil-rank quantile estimates from an exploded `(event_type, vc)`
    * sample — ONE body shared by the batch query and the streaming
    * sink verify so the two cannot drift. Bounded: the window sorts
    * ≤[[QsK]] rows per group; the cut table is a 5-row literal. */
  private[graft] def qsEstFromSample(samp: DataFrame): DataFrame = {
    val spark = samp.sparkSession
    import spark.implicits._
    val ranked = samp
      .withColumn("rn",
        row_number().over(Window.partitionBy("event_type").orderBy("vc")))
      .withColumn("ks",
        count(lit(1)).over(Window.partitionBy("event_type")))
    ranked.crossJoin(broadcast(QsPcts.toDF("pct")))
      .filter(col("rn") ===
        greatest(ceil(col("ks") * col("pct") / 100.0), lit(1L)))
      .select(col("event_type"), col("pct"), col("ks").as("k_sample"),
        (col("vc") / 100.0).as("est_value"))
  }

  def qQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = qsProjected(spark, dir)
    val pcts = broadcast(QsPcts.toDF("pct"))
    // sketch side: bounded bottom-k-by-hash sample, then ceil-rank
    // over the ≤QsK sampled values per group
    val samp = ev.groupBy("event_type")
      .agg(graft.functions.MinKPairAggregator.minKUdaf(QsK)(
        col("h"), col("vc")).as("mins"))
      .select(col("event_type"), explode(col("mins")).as("e"))
      .select(col("event_type"), col("e._2").as("vc"))
    val est = qsEstFromSample(samp)
    // exact twin: ceil-rank percentiles from the bounded value
    // histogram (qPercentile's shape), long-form over the same cuts
    val wCum = Window.partitionBy("event_type").orderBy("vc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = ev.groupBy("event_type", "vc").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
      .withColumn("lo", col("cum") - col("c"))
    val exact = hist.crossJoin(pcts)
      .withColumn("r",
        greatest(ceil(col("n") * col("pct") / 100.0), lit(1L)))
      .filter(col("lo") < col("r") && col("r") <= col("cum"))
      .select(col("event_type"), col("pct"), col("n"),
        (col("vc") / 100.0).as("exact_value"))
    est.join(exact, Seq("event_type", "pct"))
      .withColumn("abs_err",
        round(abs(col("est_value") - col("exact_value")), 2))
      .select("event_type", "pct", "n", "k_sample", "est_value",
        "exact_value", "abs_err")
      .orderBy("event_type", "pct")
  }

  /** Morton/Z-order bits per dimension for [[qZorderStats]]. */
  private[graft] val ZBits = 16

  /** `(ub, tb, zkey)`: both dims scaled to 16-bit integer buckets over
    * their corpus min/max (exact integer arithmetic), then bit-
    * interleaved into the 32-bit Morton key — one narrow projection,
    * no shuffle. */
  private[graft] def zkeyed(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ms"))
    ev.crossJoin(broadcast(ev.agg(
        min("user_id").as("u0"), max("user_id").as("u1"),
        min("ms").as("t0"), max("ms").as("t1"))))
      .withColumn("ub",
        expr("((user_id - u0) * 65535) div greatest(u1 - u0, 1)"))
      .withColumn("tb",
        expr("((ms - t0) * 65535) div greatest(t1 - t0, 1)"))
      .withColumn("zkey", expr(
        s"""aggregate(sequence(0, ${ZBits - 1}), 0L, (acc, b) ->
           |  acc + shiftleft(shiftright(ub, b) & 1, 2*b + 1)
           |      + shiftleft(shiftright(tb, b) & 1, 2*b))""".stripMargin))
  }

  /** Z-ORDER layout statistics — the multi-dimensional data-skipping
    * table (the Delta/Iceberg `OPTIMIZE ZORDER BY` idea, rooted in
    * Morton 1966 and the UB-tree literature): events bucketed to
    * 16-bit grids on BOTH query dimensions (user_id, event time),
    * bit-interleaved, and grouped by the Morton key's top 6 bits —
    * i.e. the 64 quadtree cells a z-sorted file layout would produce.
    * Each cell's min/max extent in BOTH dims is reported: by
    * construction every cell spans ≤ 2¹³ of each 2¹⁶-bucket dim (top
    * 3 bits pinned per dim), so a point predicate on EITHER dimension
    * prunes ~7/8 of the files — where a single-dim sort gives perfect
    * pruning on one dimension and ZERO on the other (ZorderSpec
    * measures exactly that contrast, and drives the file-level twin
    * through an actual partitioned parquet write via [[zorderWrite]]).
    *
    * Scale shape: the key build is a narrow per-row expression over a
    * 3-column projection (one 6-value broadcast of the corpus bounds);
    * the stats are a 64-group aggregate. The LAYOUT at 100 TB is just
    * `repartitionByRange(zkey)` + sortWithinPartitions — no new
    * machinery, the key IS the operator. */
  def qZorderStats(spark: SparkSession, dir: String): DataFrame =
    zkeyed(spark, dir)
      .withColumn("zcell", expr(s"shiftright(zkey, ${2 * ZBits - 6})"))
      .groupBy("zcell")
      .agg(count(lit(1)).as("n"),
        min("ub").as("min_ub"), max("ub").as("max_ub"),
        min("tb").as("min_tb"), max("tb").as("max_tb"))
      .orderBy("zcell")

  /** Materialize the z-ordered layout: range-partition by Morton key,
    * sort within partitions, write parquet — the file layout whose
    * per-file min/max footers bound BOTH dimensions (ZorderSpec reads
    * the written files back and checks the extents). */
  def zorderWrite(spark: SparkSession, dir: String, out: String,
      files: Int = 16): Unit =
    zkeyed(spark, dir)
      .select("event_id", "user_id", "ms", "ub", "tb", "zkey")
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(out)

  /** Heavy-hitter shuffle-key diagnostic: the top-10 user keys by
    * event volume with their corpus share and skew (share ÷ ideal
    * uniform share). This is the table that decides whether a user-
    * keyed stage needs [[Salted]] two-stage aggregation — run it
    * BEFORE the 100 TB shuffle, not after it straggles. One groupBy +
    * global top-k (TakeOrdered, no full sort). */
  def qKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val tot = counts.agg(sum("n_events").cast("long").as("n_total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share",
        round(col("n_events").cast("double") / col("n_total"), 6))
      .withColumn("skew",
        round(col("n_events").cast("double") * col("n_keys") /
          col("n_total"), 6))
      .select("user_id", "n_events", "share", "skew")
      .orderBy(desc("n_events"), col("user_id"))
      .limit(10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_key_skew"        -> (qKeySkew _),
    "q_zorder_stats"    -> (qZorderStats _),
    "q_quantile_sketch" -> (qQuantileSketch _),
    "q_corr"           -> (qCorr _),
    "q_json_extract"   -> (qJsonExtract _),
    "q_sessionize"     -> (qSessionize _),
    "q_asof_join"      -> (qAsofJoin _),
    "q_range_join"     -> (qRangeJoin _),
    "q_unpivot"        -> (qUnpivot _),
    "q_pivot"          -> (qPivot _),
    "q_running_window" -> (qRunningWindow _),
    "q_ntile"          -> (qNtile _),
    "q_funnel"         -> (qFunnel _),
    "q_retention"      -> (qRetention _),
  )

  val oracles: Map[String, String] = Map(
    "q_zorder_stats" ->
      s"""WITH r AS (
        |  SELECT min(user_id) AS u0, max(user_id) AS u1,
        |    min(epoch_ms(ts)) AS t0, max(epoch_ms(ts)) AS t1
        |  FROM events),
        |bk AS (
        |  SELECT event_id,
        |    ((user_id - u0) * 65535) // greatest(u1 - u0, 1) AS ub,
        |    ((epoch_ms(ts) - t0) * 65535) // greatest(t1 - t0, 1) AS tb
        |  FROM events, r),
        |z AS (
        |  SELECT event_id, ub, tb,
        |    sum((((ub >> b) & 1) << (2*b + 1))
        |      + (((tb >> b) & 1) << (2*b)))::BIGINT AS zkey
        |  FROM bk, LATERAL (SELECT unnest(range($ZBits)) AS b) g
        |  GROUP BY 1, 2, 3)
        |SELECT zkey >> ${2 * ZBits - 6} AS zcell, count(*) AS n,
        |  min(ub) AS min_ub, max(ub) AS max_ub,
        |  min(tb) AS min_tb, max(tb) AS max_tb
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_quantile_sketch" ->
      s"""WITH ev AS (
        |  SELECT event_type,
        |    ('0x'||substr(md5(event_id::VARCHAR),1,15))::BIGINT AS h,
        |    CAST(ROUND(value*100,0) AS BIGINT) AS vc
        |  FROM events),
        |sr AS (
        |  SELECT event_type, vc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h, vc) AS hr
        |  FROM ev),
        |sv AS (
        |  SELECT event_type, vc,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS ks
        |  FROM sr WHERE hr <= $QsK),
        |p(pct) AS (VALUES ${QsPcts.map(p => s"($p)").mkString(",")}),
        |est AS (
        |  SELECT event_type, pct, ks AS k_sample, vc/100.0 AS est_value
        |  FROM sv CROSS JOIN p
        |  WHERE rn = greatest(CAST(ceil(ks*pct/100.0) AS BIGINT), 1)),
        |hc AS (
        |  SELECT event_type, vc, c,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY vc) AS cum,
        |    (sum(c) OVER (PARTITION BY event_type))::BIGINT AS n
        |  FROM (SELECT event_type, vc, count(*) AS c FROM ev GROUP BY 1,2)),
        |ex AS (
        |  SELECT event_type, pct, n, vc/100.0 AS exact_value
        |  FROM hc CROSS JOIN p
        |  WHERE cum - c < greatest(CAST(ceil(n*pct/100.0) AS BIGINT), 1)
        |    AND greatest(CAST(ceil(n*pct/100.0) AS BIGINT), 1) <= cum)
        |SELECT e.event_type, e.pct, x.n, e.k_sample, e.est_value,
        |  x.exact_value, round(abs(e.est_value - x.exact_value), 2) AS abs_err
        |FROM est e JOIN ex x USING (event_type, pct)
        |ORDER BY event_type, pct""".stripMargin,
    "q_corr" ->
      """WITH t AS (
        |  SELECT event_type,
        |    CAST(ROUND(value*100,0) AS BIGINT) AS x,
        |    json_extract_string(props, '$.k')::BIGINT AS y
        |  FROM events),
        |s AS (
        |  SELECT event_type, count(*) AS n, sum(x)::BIGINT AS sx,
        |    sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy,
        |    sum(x*x)::BIGINT AS sxx, sum(y*y)::BIGINT AS syy
        |  FROM t GROUP BY event_type)
        |SELECT event_type, n,
        |  round((n * sxy - sx * sy)::DOUBLE /
        |    sqrt((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE), 6)
        |    AS corr_vk
        |FROM s ORDER BY event_type""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_running_window" ->
      """SELECT user_id, event_id, ts,
        |  sum(CAST(ROUND(value*100,0) AS BIGINT)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS UNBOUNDED PRECEDING) / 100.0 AS running_total,
        |  round(sum(CAST(ROUND(value*100,0) AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)::DOUBLE
        |    / count(*) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) / 100.0, 6)
        |    AS moving_avg4
        |FROM events WHERE user_id < 50
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_key_skew" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
        |t AS (
        |  SELECT sum(n_events)::BIGINT AS n_total, count(*) AS n_keys FROM c)
        |SELECT user_id, n_events,
        |  round(n_events::DOUBLE / n_total, 6) AS share,
        |  round(n_events::DOUBLE * n_keys / n_total, 6) AS skew
        |FROM c, t
        |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,
    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(epoch_ms(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_ms(e.ts) > v.t1
        |    AND epoch_ms(e.ts) <= v.t1 + 86400000
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(epoch_ms(e.ts)) AS t3
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > c.t2
        |    AND epoch_ms(e.ts) <= c.t2 + 86400000
        |  GROUP BY e.user_id),
        |n AS (
        |  SELECT (SELECT count(*) FROM v) AS n1,
        |         (SELECT count(*) FROM c) AS n2,
        |         (SELECT count(*) FROM p) AS n3)
        |SELECT 1::BIGINT AS step, 'view' AS stage, n1 AS n_users,
        |  1.0::DOUBLE AS conv FROM n
        |UNION ALL
        |SELECT 2::BIGINT, 'click', n2,
        |  round(n2::DOUBLE / NULLIF(n1, 0), 6) FROM n
        |UNION ALL
        |SELECT 3::BIGINT, 'purchase', n3,
        |  round(n3::DOUBLE / NULLIF(n2, 0), 6) FROM n
        |ORDER BY step""".stripMargin,
    "q_retention" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT d.user_id, cohort_day, day - cohort_day AS "offset"
        |  FROM d JOIN cohort USING (user_id)
        |  WHERE day - cohort_day <= 7),
        |counts AS (
        |  SELECT cohort_day, "offset", count(*) AS n_users
        |  FROM active GROUP BY 1, 2),
        |base AS (
        |  SELECT cohort_day, n_users AS n0 FROM counts WHERE "offset" = 0)
        |SELECT c.cohort_day, c."offset", c.n_users,
        |  round(c.n_users::DOUBLE / b.n0, 6) AS retained
        |FROM counts c JOIN base b USING (cohort_day)
        |ORDER BY c.cohort_day, c."offset"""".stripMargin,
    "q_ntile" ->
      """WITH t AS (
        |  SELECT event_type, value,
        |    ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
        |      AS quartile
        |  FROM events)
        |SELECT event_type, quartile, count(*) AS n,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM t GROUP BY event_type, quartile
        |ORDER BY event_type, quartile""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |  min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
        |  max(json_extract_string(props, '$.k')::BIGINT) AS max_k
        |FROM events
        |WHERE json_extract_string(props, '$.k')::BIGINT >= 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) > 30*60*1000
        |         THEN 1 ELSE 0 END AS gap
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts, value,
        |    sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  sum(CAST(ROUND(value*100,0) AS BIGINT))/100.0 AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_unpivot" ->
      """SELECT user_id, event_type, count(*)::BIGINT AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id, count(c.ts)::BIGINT AS n_clicks,
        |  coalesce(sum(CAST(ROUND(c.value*100,0) AS BIGINT)), 0)::BIGINT
        |    AS click_cents
        |FROM events p LEFT JOIN events c
        |  ON c.event_type = 'click'
        |  AND abs(epoch_ms(c.ts) - epoch_ms(p.ts)) <= 30*60*1000
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q_asof_join" ->
      """WITH ve AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS view_ts,
        |    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS view_value
        |  FROM events WHERE event_type IN ('view', 'purchase'))
        |SELECT user_id, event_id, ts, view_ts, view_value
        |FROM ve WHERE event_type = 'purchase' AND view_ts IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin,
  )
}
