package graft
package plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DotProduct
import graft.functions.VectorFunctions.{dot, dotHof}

/** The injected optimizer rule must turn the reference-shaped HOF dot
  * product into the codegen'd graft_dot — and must NOT fire on shapes
  * with different semantics. */
class RewriteDotProductSpec extends SparkSpec {

  private def optimizedHas(df: DataFrame, p: String): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(
      _.exists {
        case _: DotProduct => p == "graft_dot"
        case e => e.prettyName == p
      })

  test("HOF dot product is rewritten to graft_dot in the optimized plan") {
    val e = Tables.embeddings(spark, sfDir)
    val df = e.select(dotHof(col("embedding"), col("embedding")).as("s"))
    assert(optimizedHas(df, "graft_dot"))
    assert(!optimizedHas(df, "aggregate"))
    // and the widening transform wrapper is stripped (raw float arrays
    // feed graft_dot directly)
    assert(!optimizedHas(df, "transform"))
  }

  test("rewritten plan returns bit-identical results to genuine HOF evaluation") {
    val e = Tables.embeddings(spark, sfDir).limit(50).cache()
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    def run() = e.crossJoin(broadcast(q))
      .select(col("vec_id"), dotHof(col("embedding"), col("qv")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaRule = run()
    val genuineHof =
      withoutOptimizerRules("graft.plans.RewriteDotProduct")(run())
    val native = e.crossJoin(broadcast(q))
      .select(col("vec_id"), dot(col("embedding"), col("qv")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule === native)
    assert(genuineHof === native)
    e.unpersist()
  }

  test("rule does not fire on different aggregate shapes") {
    val e = Tables.embeddings(spark, sfDir)
    // non-zero seed: a sum-with-offset is not a dot product
    val offset = e.select(
      aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(1.0), (acc, x) => acc + x).as("s"))
    assert(!optimizedHas(offset, "graft_dot"))
    // max-merge: not a sum
    val maxAgg = e.select(
      aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0), (acc, x) => greatest(acc, x)).as("s"))
    assert(!optimizedHas(maxAgg, "graft_dot"))
    // combine lambda that is not a plain product
    val sumAbs = e.select(
      aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => abs(x - y)),
        lit(0.0), (acc, x) => acc + x).as("s"))
    assert(!optimizedHas(sumAbs, "graft_dot"))
  }

  test("rule fires on the raw un-widened float spelling too") {
    val e = Tables.embeddings(spark, sfDir)
    // user writes zip_with directly over float arrays (no cast): the
    // float product sums differ from graft_dot's double widening ONLY
    // if Spark kept float math — but zip_with's Multiply over floats
    // IS float math, so this shape must still rewrite correctly or not
    // at all. It rewrites: graft_dot widens before multiply, while the
    // HOF multiplies floats then widens on add. Those differ bit-wise,
    // so the rule must NOT fire here.
    val floatMul = e.select(
      aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("s"))
    // document whichever way analysis resolves it: if Catalyst inserts
    // double casts around the float lambda vars (standard numeric
    // promotion against the 0.0d seed), widening happens pre-multiply
    // and the rewrite is exact; otherwise the shape won't match the
    // pattern and must be left alone.
    val opt = floatMul.queryExecution.optimizedPlan.expressions
      .exists(_.exists { case _: DotProduct => true; case _ => false })
    if (opt) {
      val viaRule = floatMul.collect().map(_.getDouble(0))
      val native = e.select(dot(col("embedding"), col("embedding")).as("s"))
        .collect().map(_.getDouble(0))
      assert(viaRule.toSeq === native.toSeq)
    }
  }
}
