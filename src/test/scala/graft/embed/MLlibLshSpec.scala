package graft
package embed

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** MLlib bridge (SURVEY.md §7.3): BucketedRandomProjectionLSH over the
  * embeddings table as the library-provided ANN alternative to the
  * engine's own LSH/IVF operators. Seeded → deterministic. */
class MLlibLshSpec extends SparkSpec {

  test("BRP-LSH approxNearestNeighbors overlaps the exact top-10") {
    val spark2 = spark
    import spark2.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .map { case (id, e) => (id, Vectors.dense(e.map(_.toDouble))) }
      .toDF("vec_id", "features")

    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(vecs)

    val qv = vecs.filter(col("vec_id") === 0).head.getAs[org.apache.spark.ml.linalg.Vector]("features")
    val ann = model.approxNearestNeighbors(
      vecs.filter(col("vec_id") =!= 0), qv, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    val exact = operators.Search.qKnn(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // Euclidean-NN on unnormalized vectors vs cosine ranking differ,
    // but on clustered data they must agree substantially
    assert(ann.intersect(exact).size >= 5,
      s"overlap ${ann.intersect(exact).size}: ann=$ann exact=$exact")
  }
}
