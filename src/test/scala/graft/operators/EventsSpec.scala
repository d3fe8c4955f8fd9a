package graft
package operators

import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("as-of join: matched view is always at or before the purchase") {
    val r = Events.qAsofJoin(spark, sfDir)
    assert(r.count() > 0)
    assert(r.filter(col("view_ts") > col("ts")).count() === 0)
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
}
