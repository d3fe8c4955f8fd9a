package graft
package store

import org.apache.spark.sql.functions._

/** Bucketing = the 100 TB co-location lever: two tables bucketed on
  * the join key join WITHOUT a shuffle (no Exchange above either
  * scan). This is what "pre-partition the chunk store by sourceId for
  * reassembly joins" means concretely (SURVEY.md §4). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without Exchange; unbucketed join shuffles") {
    // (warehouse dir is a static conf; managed tables land in the
    // default spark-warehouse and are dropped — with their files —
    // in the finally below.)
    // small side must exceed broadcast threshold to force SMJ — just
    // disable auto-broadcast for this test
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
      val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")

      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      l.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val bucketed = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bPlan")

      val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
      val pPlan = plain.queryExecution.executedPlan.toString
      assert(pPlan.contains("Exchange"))

      // and of course both produce the same row count
      assert(bucketed.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("approximate sketches: approx_count_distinct within 5% of exact") {
    val l = Tables.lineitem(spark, sfDir)
    val exact = l.select(countDistinct("l_orderkey")).head.getLong(0)
    val approx = l.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
