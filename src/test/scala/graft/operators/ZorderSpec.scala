package graft
package operators

import org.apache.spark.sql.functions._

/** Z-order layout ([[Events.qZorderStats]] / [[Events.zorderWrite]]):
  * the quadtree-cell extent law must hold exactly, and the written
  * file layout must bound BOTH dimensions where a single-dim sort
  * bounds only one — measured from the actual parquet files.
  */
class ZorderSpec extends SparkSpec {

  test("z-order cells: exact quadtree extent law in both dimensions") {
    val cells = Events.qZorderStats(spark, sfDir).collect()
    assert(cells.nonEmpty && cells.length <= 64)
    val n = Tables.events(spark, sfDir).count()
    assert(cells.map(_.getLong(1)).sum === n)
    // top 3 bits of each dim are pinned per cell → extent ≤ 2^13 - 1
    cells.foreach { c =>
      assert(c.getLong(3) - c.getLong(2) <= (1 << 13) - 1,
        s"ub extent too wide in cell ${c.getLong(0)}")
      assert(c.getLong(5) - c.getLong(4) <= (1 << 13) - 1,
        s"tb extent too wide in cell ${c.getLong(0)}")
    }
  }

  test("z-order files bound both dims; a time sort leaves user unbounded") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    Events.zorderWrite(spark, sfDir, s"$work/z")
    Events.zkeyed(spark, sfDir)
      .select("event_id", "user_id", "ms", "ub", "tb", "zkey")
      .repartitionByRange(16, col("tb"))
      .sortWithinPartitions("tb")
      .write.mode("overwrite").parquet(s"$work/t")

    def extents(path: String): Array[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max("ub") - min("ub")).as("ube"),
          (max("tb") - min("tb")).as("tbe"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))

    def medianL(xs: Seq[Long]): Long = xs.sorted.apply(xs.length / 2)

    val z = extents(s"$work/z")
    val t = extents(s"$work/t")
    assert(z.length >= 8 && t.length >= 8)
    val zUb = medianL(z.map(_._1).toSeq)
    val tUb = medianL(t.map(_._1).toSeq)
    // the z layout's typical file spans a bounded user range; the
    // time-sorted layout's files span essentially the whole user dim
    assert(zUb < tUb, s"zUb=$zUb tUb=$tUb")
    assert(tUb > 32768, s"time-sorted files unexpectedly bounded: $tUb")
    assert(zUb <= (1 << 14), s"z files wider than a quadtree parent: $zUb")
    // and the z layout still bounds time: range-partition cuts from
    // quantile sampling don't align to power-of-2 cell boundaries, so
    // a file can straddle a parent-block transition — the guarantee is
    // "well under the full dim", not a single quadtree parent
    val zTb = medianL(z.map(_._2).toSeq)
    assert(zTb <= (1 << 15), s"z files time extent: $zTb")
  }
}
