package graft
package operators

import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("as-of join: matched view is always at or before the purchase") {
    val r = Events.qAsofJoin(spark, sfDir)
    assert(r.count() > 0)
    assert(r.filter(col("view_ts") > col("ts")).count() === 0)
  }

  test("unpivot: melt(pivot(events)) equals the direct long-form " +
      "groupBy, zero cells dropped") {
    val melted = Events.qUnpivot(spark, sfDir)
    val direct = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n2"))
    assert(melted.join(direct, Seq("user_id", "event_type"), "full_outer")
      .filter(col("n").isNull || col("n2").isNull ||
        col("n") =!= col("n2")).count() === 0)
    assert(melted.filter(col("n") <= 0).count() === 0)
  }

  test("event-type universe: the table contains exactly the closed " +
      "EventTypes set the pivot/unpivot column lists assume") {
    val actual = Tables.events(spark, sfDir)
      .select("event_type").distinct().collect().map(_.getString(0)).sorted
    assert(actual.toSeq === Events.EventTypes)
  }

  test("range join: equi-join plan (no nested loop), counts equal the " +
      "direct inequality-join recompute") {
    val out = Events.qRangeJoin(spark, sfDir)
    // the banded rewrite must plan as an equi-join on bucket — the
    // whole point vs the quadratic BNLJ Spark gives inequality joins
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // brute-force recompute (spec scale only): same counts and cents
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_millis(col("ts")).as("pms"))
    val c = ev.filter(col("event_type") === "click")
      .select(unix_millis(col("ts")).as("cms"),
        Relational.cents(col("value")).as("cv"))
    val brute = p.crossJoin(c)
      .filter(abs(col("cms") - col("pms")) <= 30L * 60 * 1000)
      .groupBy("event_id")
      .agg(count(lit(1)).as("bn"), sum("cv").as("bc"))
    val joined = out.join(brute, Seq("event_id"), "left")
    assert(joined.filter(
      coalesce(col("bn"), lit(0L)) =!= col("n_clicks") ||
        coalesce(col("bc"), lit(0L)) =!= col("click_cents")).count() === 0)
    // zero-match purchases are present, not dropped
    assert(out.count() ===
      ev.filter(col("event_type") === "purchase").count())
  }

  test("sessionize: bounds ordered, all events accounted for") {
    val s = Events.qSessionize(spark, sfDir)
    assert(s.filter(col("session_start") > col("session_end")).count() === 0)
    val total = s.agg(sum("n_events")).head.getLong(0)
    assert(total === Tables.events(spark, sfDir).count())
    // session ids are dense from 0 per user
    val bad = s.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") - 1)
    assert(bad.count() === 0)
  }

  test("dedup pipeline: survivor counts are monotone non-increasing") {
    val r = Dedup.qDedupPipeline(spark, sfDir).head
    val (in, ex, near) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(in >= ex && ex >= near && near > 0)
  }

  test("funnel: monotone step counts, conversions are step-over-step ratios") {
    val rows = Events.qFunnel(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("step")).toSeq == Seq(1L, 2L, 3L))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2))
    assert(rows(0).getAs[Double]("conv") === 1.0)
    if (ns(0) > 0)
      assert(math.abs(rows(1).getAs[Double]("conv") -
        ns(1).toDouble / ns(0)) < 1e-5)
  }

  test("retention: offset 0 is full, fractions never exceed 1") {
    val r = Events.qRetention(spark, sfDir)
    import org.apache.spark.sql.functions._
    assert(r.filter(col("offset") === 0 && col("retained") =!= 1.0).count() === 0)
    assert(r.filter(col("retained") > 1.0 || col("retained") <= 0.0).count() === 0)
    assert(r.filter(col("offset") < 0 || col("offset") > 7).count() === 0)
    // every user appears in exactly one cohort at offset 0
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(r.filter(col("offset") === 0)
      .agg(sum("n_users")).head.getLong(0) === users)
  }

  test("key skew: shares are consistent and ranking is by volume") {
    import org.apache.spark.sql.functions._
    val r = Events.qKeySkew(spark, sfDir).collect()
    assert(r.length === 10)
    val ns = r.map(_.getAs[Long]("n_events"))
    assert(ns.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    r.foreach { row =>
      val share = row.getAs[Double]("share")
      assert(share > 0 && share <= 1)
      // skew = share × key count: a uniform key sits at 1.0
      assert(row.getAs[Double]("skew") >= share)
    }
  }
}
