package graft
package text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.Embedder.hash60Col
import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.toks

/** KMV distinct-cardinality sketch: the bounded-buffer aggregator path
  * must equal the window formulation exactly, and the estimator must
  * behave (exact below K, bounded error above). */
class KmvSpec extends SparkSpec {

  private def distinctHashes = Tables.documents(spark, sfDir)
    .withColumn("t", toks(col("text")))
    .filter(size(col("t")) >= 3)
    .select(col("lang"),
      explode(transform(sequence(lit(1), size(col("t")) - 2),
        i => hash60Col(concat_ws(" ", element_at(col("t"), i),
          element_at(col("t"), i + 1), element_at(col("t"), i + 2)))))
        .as("h"))
    .distinct()

  test("kmv: aggregator h_k equals the window-rank h_k") {
    val k = TextAnalysis.KmvK
    val viaWindow = distinctHashes
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy("h")))
      .filter(col("rn") === k)
      .select(col("lang"), col("h").as("h_k"))
    val out = TextAnalysis.qKmvDistinct(spark, sfDir)
    val est = out.join(viaWindow, Seq("lang"), "left")
      .withColumn("expect",
        when(col("h_k").isNull, col("n_exact")).otherwise(expr(
          s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976 AS DECIMAL(38,0)) div h_k")))
      .filter(col("kmv_est") =!= col("expect"))
    assert(est.count() === 0)
  }

  test("kmv: exact below K, bounded relative error above") {
    val k = TextAnalysis.KmvK
    val out = TextAnalysis.qKmvDistinct(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nExact, est, err) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      if (nExact < k) assert(est === nExact && err === 0.0)
      // KMV σ ≈ 1/√(K−2) ≈ 0.127 at K=64; 5σ guards flakiness without
      // letting a broken estimator through
      else assert(err < 0.65, s"lang=${r.getString(0)} err=$err")
    }
  }
}
