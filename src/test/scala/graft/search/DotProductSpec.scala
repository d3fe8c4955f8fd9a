package graft
package search

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, dotHof}

/** The codegen'd DotProduct must be bit-identical to the HOF
  * formulation the DuckDB oracles were validated against. */
class DotProductSpec extends SparkSpec {

  test("graft_dot == aggregate(zip_with(...)) bit-for-bit on real vectors") {
    // exclude the rewrite rule so the HOF side evaluates as a GENUINE
    // higher-order aggregate, not rule-rewritten graft_dot
    withoutOptimizerRules("graft.plans.RewriteDotProduct") {
      val e = Tables.embeddings(spark, sfDir)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val both = e.crossJoin(broadcast(q))
        .select(
          dot(col("embedding"), col("qv")).as("native"),
          dotHof(col("embedding"), col("qv")).as("hof"))
      // bit-exact: compare raw doubles, no tolerance
      assert(both.filter(col("native") =!= col("hof")).count() === 0)
    }
  }

  test("graft_dot handles double arrays and mixed float/double") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5, 0.25, 2.0)))
      .toDF("f", "d")
    val r = df.select(
      dot(col("f"), col("d")).as("fd"),
      dot(col("d"), col("d")).as("dd"),
      dot(col("f"), col("f")).as("ff")).head
    assert(r.getDouble(0) === 1.0 * 0.5 + 2.0 * 0.25 + 3.0 * 2.0)
    assert(r.getDouble(1) === 0.25 + 0.0625 + 4.0)
    assert(r.getDouble(2) === 14.0)
  }

  test("graft_dot matches HOF null semantics on degenerate inputs") {
   withoutOptimizerRules("graft.plans.RewriteDotProduct") {
    val spark2 = spark
    import spark2.implicits._
    // zip_with pads the shorter array with null → null product → null
    // aggregate sum; graft_dot must agree (ADVICE r2: was a silent
    // truncation to min length).
    val mismatch = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)))
      .toDF("a", "b")
      .select(dot(col("a"), col("b")).as("native"),
              dotHof(col("a"), col("b")).as("hof"))
      .head
    assert(mismatch.isNullAt(0) && mismatch.isNullAt(1))
    // null element anywhere → null result, both formulations
    val withNull = Seq((Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
      .select(dot(col("a"), col("b")).as("native"),
              dotHof(col("a"), col("b")).as("hof"))
      .head
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
    // null array input → null out (standard null-safe binary expr)
    val nullArr = Seq((Array(1.0f), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(dot(col("a"), col("b")).as("native")).head
    assert(nullArr.isNullAt(0))
   }
  }

  test("scoring projection compiles into whole-stage codegen") {
    // join-free shape: scan → project(graft_dot) must fuse into WSCG.
    // (Cross joins use BroadcastNestedLoopJoin, which never enters
    // WSCG — there the Project still runs as a codegen'd
    // UnsafeProjection, verified bit-exact above.)
    val e = Tables.embeddings(spark, sfDir)
    val plan = e.select(dot(col("embedding"), col("embedding")).as("s"))
      .queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen stage marker in plan toString
    assert(plan.contains("*(1) Project [graft_dot"))
  }
}
