package graft
package operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-capped diversity subsampling: the bounded-aggregator path
  * must equal the per-cell rank window row-for-row, and the cap
  * semantics must hold (never more than K per cell, small cells kept
  * whole, survivors are each cell's most central members). */
class ClusterCapSpec extends SparkSpec {

  private def rankedTwin = {
    val assign = Ann.ivfRanked(spark, sfDir).filter(col("rn") === 1)
      .select(col("cell"), col("vec_id"),
        round(col("csim") * 1000000, 0).cast("long").as("csim_micro"))
    val w = Window.partitionBy("cell")
      .orderBy(desc("csim_micro"), col("vec_id"))
    assign
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= Ann.ClusterCapK)
      .select("cell", "rk", "vec_id", "csim_micro")
      .orderBy("cell", "rk")
  }

  test("q_cluster_cap equals the per-cell rank-window twin") {
    val got = Ann.qClusterCap(spark, sfDir).collect()
    val twin = rankedTwin.collect()
    assert(got.nonEmpty)
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq ===
      twin.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)
  }

  test("q_cluster_cap semantics: per-cell budget respected, small " +
      "cells kept whole, survivors dominate non-survivors") {
    val got = Ann.qClusterCap(spark, sfDir).collect()
    val perCell = got.groupBy(_.getLong(0))
    perCell.foreach { case (_, rows) =>
      assert(rows.length <= Ann.ClusterCapK)
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (1L to rows.length).toSeq)
    }
    val cellSizes = Ann.ivfRanked(spark, sfDir).filter(col("rn") === 1)
      .groupBy("cell").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cellSizes.foreach { case (cell, n) =>
      val kept = perCell.get(cell).map(_.length).getOrElse(0)
      assert(kept === math.min(n, Ann.ClusterCapK.toLong))
    }
    // each cell's worst survivor beats (or ties with earlier id than)
    // every non-survivor of that cell
    val all = Ann.ivfRanked(spark, sfDir).filter(col("rn") === 1)
      .select(col("cell"), col("vec_id"),
        round(col("csim") * 1000000, 0).cast("long").as("m"))
      .collect().groupBy(_.getLong(0))
    perCell.foreach { case (cell, rows) =>
      val keptIds = rows.map(_.getLong(2)).toSet
      val worst = rows.maxBy(_.getLong(1))
      val (wId, wM) = (worst.getLong(2), worst.getLong(3))
      all(cell).filterNot(r => keptIds(r.getLong(1))).foreach { r =>
        val (id, m) = (r.getLong(1), r.getLong(2))
        assert(m < wM || (m == wM && id > wId),
          s"cell $cell: dropped ($id,$m) beats worst survivor ($wId,$wM)")
      }
    }
  }
}
