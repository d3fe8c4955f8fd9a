package graft
package dedup

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental (batch-vs-corpus) dedup verdicts must reconcile exactly
  * with the pair graph they are derived from. */
class IncrDedupSpec extends SparkSpec {

  test("incr dedup: verdicts reconcile with the near-dup pair graph") {
    val docs = Tables.documents(spark, sfDir)
    val cut = docs.agg(expr("((max(doc_id)+1)*9) div 10").as("cut"))
      .head.getLong(0)
    val out = Dedup.qIncrDedup(spark, sfDir)
    // exactly the batch docs, one row each
    val nNew = docs.filter(col("doc_id") >= cut).count()
    assert(out.count() === nNew)
    assert(out.select("doc_id").distinct().count() === nNew)

    val pairs = Dedup.nearDupPairs(spark, sfDir)
      .filter(col("jaccard") >= 0.5 && col("doc_b") >= cut)
    // every dup verdict is backed by a pair of the right class, and
    // corpus matches always win over batch matches
    val backed = out.filter(col("verdict") =!= "unique")
      .join(pairs.select(col("doc_b").as("doc_id"),
        col("doc_a").as("partner"), col("jaccard").as("pj")),
        Seq("doc_id", "partner"))
    assert(backed.count() === out.filter(col("verdict") =!= "unique").count())
    assert(backed.filter(col("jaccard") =!= col("pj")).count() === 0)
    val wrongClass = out.filter(
      (col("verdict") === "dup_of_corpus" && col("partner") >= cut) ||
      (col("verdict") === "dup_in_batch" && col("partner") < cut)).count()
    assert(wrongClass === 0)
    val missedCorpus = out.filter(col("verdict") === "dup_in_batch")
      .join(pairs.filter(col("doc_a") < cut)
        .select(col("doc_b").as("doc_id")), "doc_id").count()
    assert(missedCorpus === 0)
    // unique means NO qualifying pair exists
    val falseUnique = out.filter(col("verdict") === "unique")
      .join(pairs.select(col("doc_b").as("doc_id")).distinct(), "doc_id")
      .count()
    assert(falseUnique === 0)
  }
}
