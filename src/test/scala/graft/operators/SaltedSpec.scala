package graft
package operators

import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSpec {

  test("salted two-stage aggregation == direct groupBy (skewed keys)") {
    // l_returnflag has only 3 values → maximal key skew
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum(col("l_quantity")).as("sum_v"), count(lit(1)).as("n"))
    val salted = Salted.saltedSumCount(li, col("l_returnflag"),
      col("l_quantity"), col("l_orderkey"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("hot-key probe flags a planted dominant key, not uniform ones") {
    import spark.implicits._
    // 6000 rows on one key + 40 uniform keys of 100 rows each
    val planted = (1 to 6000).map(i => ("HOT", i.toLong)) ++
      (1 to 40).flatMap(k => (1 to 100).map(i => (s"k$k", (k * 1000 + i).toLong)))
    val df = planted.toDF("g", "doc_id").repartition(8)
    val hot = Salted.hotKeys(df, col("g"), hotShare = 0.05)
    assert(hot === Seq("HOT"))
    // no key dominates a uniform table
    assert(Salted.hotKeys(df.filter(col("g") =!= "HOT"), col("g"),
      hotShare = 0.05).isEmpty)
  }

  test("owner stats: salted path == window path on a planted hot key") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => ("HOT", i.toLong)) ++
      (1 to 30).flatMap(k => (1 to 50).map(i => (s"k$k", (k * 1000 + i).toLong)))
    val df = rows.toDF("g", "doc_id").repartition(8)
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.select("g", "doc_id", "owner", "n_keyrows")
        .orderBy("g", "doc_id").collect().toSeq
    val viaWindow = canon(Salted.withOwnerStats(df, col("g"), col("doc_id")))
    val viaSalt = canon(Salted.withOwnerStats(df, col("g"), col("doc_id"),
      hot = Seq("HOT")))
    assert(viaSalt === viaWindow)
    // the salted plan really engaged: no Window node, and the auto
    // hook picks it for this planted distribution
    val saltPlan = Salted.withOwnerStats(df, col("g"), col("doc_id"),
      hot = Seq("HOT")).queryExecution.executedPlan.toString
    assert(!saltPlan.contains("Window"), saltPlan)
    assert(canon(Salted.autoOwnerStats(df, col("g"), col("doc_id"))) === viaWindow)
  }

  test("multi-probe LSH recall ≥ single-bucket recall") {
    val single = Ann.qAnnLsh(spark, sfDir).count()
    val multi = Ann.qAnnLshProbe(spark, sfDir).count()
    assert(multi >= single)
    // and multi-probe candidates include the single-bucket ones
    val s = Ann.qAnnLsh(spark, sfDir).select("vec_id").collect().map(_.getLong(0)).toSet
    val m = Ann.qAnnLshProbe(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // top-10 of a superset candidate pool scores ≥ — every single-bucket
    // hit either appears or was displaced by a strictly better one
    val minMulti = Ann.qAnnLshProbe(spark, sfDir)
      .agg(min("score")).head.getDouble(0)
    val lshScores = Ann.qAnnLsh(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    s.diff(m).foreach { vid => assert(lshScores(vid) <= minMulti + 1e-9) }
  }
}
