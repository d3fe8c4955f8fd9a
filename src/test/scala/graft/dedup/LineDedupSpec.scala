package graft
package dedup

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.operators.TextAnalysis.toks

/** Invariants of segment-level (C4-style) line dedup and of the
  * Bloom-prefiltered decontamination twin (exact values go through the
  * Verify/DuckDB gate; these pin structure). */
class LineDedupSpec extends SparkSpec {

  test("line dedup: every distinct segment survives exactly once") {
    val out = Dedup.qLineDedup(spark, sfDir)
    // distinct segment count, recomputed independently of the operator
    val nDistinct = Tables.documents(spark, sfDir)
      .withColumn("t", toks(col("text")))
      .filter(size(col("t")) > 0)
      .select(explode(transform(
        sequence(lit(0), ((size(col("t")) - 1) / 10).cast("int")),
        i => concat_ws(" ", slice(col("t"), i * 10 + 1, lit(10))))).as("seg"))
      .select("seg").distinct().count()
    assert(out.agg(sum("n_kept")).head.getLong(0) === nDistinct)
    // accounting: kept never exceeds total, frac consistent
    assert(out.filter(col("n_kept") > col("n_segs")).count() === 0)
    assert(out.filter(col("n_segs") === 0).count() === 0)
  }

  test("line dedup: reassembled text carries exactly the kept tokens") {
    val out = Dedup.qLineDedup(spark, sfDir)
    // a doc's dedup_text is empty iff nothing was kept; and when all
    // segments were kept it must reproduce the tokenized original
    assert(out.filter((col("dedup_text") === "") =!=
      (col("n_kept") === 0)).count() === 0)
    val full = out.filter(col("n_kept") === col("n_segs"))
      .join(Tables.documents(spark, sfDir), "doc_id")
      .withColumn("orig", concat_ws(" ", toks(col("text"))))
      .filter(col("dedup_text") =!= col("orig"))
    assert(full.count() === 0)
  }

  test("bloom decontamination == broadcast decontamination, row for row") {
    val a = Dedup.qDecontaminate(spark, sfDir)
    val b = Dedup.qBloomDecon(spark, sfDir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
