package graft
package embed

import org.apache.spark.ml.linalg.Vector

class MLlibEmbedderSpec extends SparkSpec {

  test("MLlib pipeline emits unit-norm vectors of the requested dim") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "table scan fast"), (2L, "join merge stream"),
      (3L, "table scan fast table")).toDF("id", "text")
    val out = MLlibEmbedder.embed(df, "text", "emb", dim = 64)
    val vecs = out.select("emb").collect().map(_.getAs[Vector](0))
    assert(vecs.forall(_.size === 64))
    vecs.foreach { v =>
      val n = math.sqrt(v.toArray.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  test("deterministic across runs; identical text → identical vector") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("id", "text")
    val a = MLlibEmbedder.embed(df, "text", "emb", dim = 32)
      .select("emb").collect().map(_.getAs[Vector](0))
    assert(a(0) === a(1))
    val b = MLlibEmbedder.embed(df, "text", "emb", dim = 32)
      .select("emb").collect().map(_.getAs[Vector](0))
    assert(a(0) === b(0))
  }
}
