package graft
package functions

import org.apache.spark.sql.functions._

/** Native integer mat-vec ([[MatVecMicro]], SQL `graft_imatvec`):
  * bit-equal to the higher-order-function formulation it replaces in
  * the OPQ encode, strict on malformed matrices.
  */
class MatVecMicroSpec extends SparkSpec {

  test("matvec equals the zip_with/aggregate HOF form on random data") {
    val spark2 = spark
    import spark2.implicits._
    val m = (0 until 8).map(k => (0 until 8).map(d =>
      ((k * 31 + d * 17) % 13 - 6).toLong))
    val rot = typedlit(m)
    val xs = (0 until 100).map(i =>
      (i.toLong, (0 until 8).map(d => ((i * 7 + d * 3) % 19 - 9).toLong)))
      .toDF("id", "x")
    val native = xs.select(col("id"),
      call_function("graft_imatvec", col("x"), rot).as("y"))
    val hof = xs.select(col("id"),
      transform(rot, r =>
        aggregate(zip_with(col("x"), r, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v)).as("y"))
    assert(native.collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      .toSeq.sortBy(_._1) ===
      hof.collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
        .toSeq.sortBy(_._1))
  }

  test("matvec: row-length mismatch yields NULL, not a wrong answer") {
    val spark2 = spark
    import spark2.implicits._
    val bad = typedlit(Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)))
    val out = Seq((1L, Seq(1L, 2L))).toDF("id", "x")
      .select(call_function("graft_imatvec", col("x"), bad).as("y"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
