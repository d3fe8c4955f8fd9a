package graft
package functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.embed.Embedder

/** Native `graft_hash60` ([[Hash60]]): bit-equal to the builtin
  * md5-hex composite (the form every DuckDB oracle recomputes) over
  * the corpus, driver-side `hash60`, SQL registration, and edge cases.
  */
class Hash60Spec extends SparkSpec {

  test("hash60: native expression equals the composite over the corpus") {
    val d = Tables.documents(spark, sfDir)
      .select(col("text").as("s"))
      .union(Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("string").as("s")))
    val diff = d
      .withColumn("a", Embedder.hash60Col(col("s")))
      .withColumn("b", Embedder.hash60ColComposite(col("s")))
      .filter(col("a") =!= col("b") || col("a") < 0)
    assert(diff.count() === 0)
  }

  test("hash60: matches the driver-side scala path and known values") {
    Seq("", "hello", "a:b", "über ασδ 漢字", "0", " ").foreach { s =>
      assert(Hash60.compute(UTF8String.fromString(s)) === Embedder.hash60(s),
        s"mismatch for '$s'")
    }
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592 → first 15 hex
    assert(Hash60.compute(UTF8String.fromString("hello")) ===
      java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("hash60: SQL surface and null propagation") {
    import spark.implicits._
    val r = Seq(Some("x"), None).toDF("s")
      .selectExpr("graft_hash60(s) AS h").collect()
    assert(r.exists(row => !row.isNullAt(0)) &&
      r.exists(_.isNullAt(0)))
    assert(spark.sql("SELECT graft_hash60('hello') AS h").head.getLong(0) ===
      Embedder.hash60("hello"))
  }
}
