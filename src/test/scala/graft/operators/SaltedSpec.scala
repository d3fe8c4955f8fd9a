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
