package graft
package operators

import org.apache.spark.sql.functions._

/** Variance-balanced PQ dimension allocation ([[Ann.qPqBalance]]):
  * the output must be a snake permutation over exact variance ranks
  * partitioning the dims evenly, its per-subspace variance balance
  * must not be worse than the contiguous split, and the re-allocated
  * layout must flow through the UNCHANGED integer encode plan.
  */
class PqBalanceSpec extends SparkSpec {

  test("pq balance: even partition, snake over variance ranks, tighter spread") {
    val rows = Ann.qPqBalance(spark, sfDir).collect()
    assert(rows.length === Ann.Dim)
    val bySub = rows.groupBy(_.getLong(3))
    assert(bySub.keySet === (0 until Ann.SubSpaces).map(_.toLong).toSet)
    bySub.values.foreach(g => assert(g.length === Ann.SubDim))
    // snake law: block b of the rank order deals left-to-right when
    // even, right-to-left when odd
    rows.sortBy(_.getInt(2)).zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(2) === i)
      val expect =
        if ((i / Ann.SubSpaces) % 2 == 0) i % Ann.SubSpaces
        else Ann.SubSpaces - 1 - i % Ann.SubSpaces
      assert(r.getLong(3) === expect.toLong, s"rank $i")
    }
    // balance: snake spread over per-subspace variance sums is no
    // worse than the contiguous floor(d/SubDim) split (deterministic
    // corpus, so this measured relation is stable)
    val varByDim = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    def spread(assign: Int => Int): Long = {
      val sums = (0 until Ann.Dim).groupBy(assign)
        .values.map(_.map(varByDim(_)).sum)
      sums.max - sums.min
    }
    val subOf = rows.map(r => r.getInt(0) -> r.getLong(3).toInt).toMap
    assert(spread(subOf) <= spread(_ / Ann.SubDim),
      s"snake=${spread(subOf)} contiguous=${spread(_ / Ann.SubDim)}")
  }

  test("pq balance: re-allocated layout encodes through the unchanged plan") {
    import spark.implicits._
    val balanced = Ann.qPqBalance(spark, sfDir).select(col("d"), col("sub"))
    val contiguous = (0 until Ann.Dim)
      .map(d => (d, d / Ann.SubDim)).toDF("d", "sub")
    def err(mapping: org.apache.spark.sql.DataFrame): Long = {
      val sv = Ann.pqComponentsMapped(spark, sfDir, mapping)
      Ann.pqQuantError(sv, Ann.pqBootstrapCents(sv))
    }
    val (eBal, eCont) = (err(balanced), err(contiguous))
    assert(eBal > 0 && eCont > 0)
    info(s"quant error: balanced=$eBal contiguous=$eCont " +
      f"ratio=${eBal.toDouble / eCont}%.4f")
    // codes per vector stay SubSpaces wide under the mapping
    val sv = Ann.pqComponentsMapped(spark, sfDir, balanced)
    val codes = Ann.pqAssign(sv, Ann.pqBootstrapCents(sv))
    val perVec = codes.groupBy("vec_id").agg(count(lit(1)).as("k"))
      .filter(col("k") =!= Ann.SubSpaces.toLong).count()
    assert(perVec === 0)
  }
}
