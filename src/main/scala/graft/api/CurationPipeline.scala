package graft
package api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Quality}

/** The end-to-end corpus-curation job: raw documents → quality gate →
  * near-dup curation → curated corpus + attrition manifest. This is
  * the composition a 100 TB training-data run executes once per
  * snapshot; every stage is one of the engine's audited operators, so
  * the pipeline inherits their oracle-checked semantics and their
  * scale shapes (no new shuffles are introduced here — only doc-keyed
  * joins against the cached stat artifacts).
  *
  * Stages:
  *  1. quality gate — [[Quality.qFilterChain]]'s composite keep
  *     (Gopher rules ∧ repetition rules ∧ substring-span dedup);
  *  2. near-dup curation — drop every member of a MinHash component
  *     except [[Dedup.qSemdedup]]'s kept representative;
  *  3. write the survivors partitioned by `lang` (partition pruning
  *     for downstream per-language sampling).
  */
object CurationPipeline {

  /** Run the pipeline; returns the attrition manifest (stage → doc and
    * char counts — the report every curation run ships with). Writes
    * the curated corpus to `outPath` when non-empty. */
  def curate(spark: SparkSession, dir: String,
      outPath: String = ""): DataFrame = {
    val docs = Tables.documents(spark, dir)

    val kept = Quality.qFilterChain(spark, dir)
      .filter(col("keep")).select(col("doc_id"), lit(true).as("__q"))

    // non-representative members of every near-dup component
    val losers = Dedup.componentLabels(spark, dir)
      .join(Dedup.qSemdedup(spark, dir)
          .select(col("group_id").as("grp"), col("kept_doc")), "grp")
      .filter(col("doc_id") =!= col("kept_doc"))
      .select(col("doc_id"), lit(true).as("__l"))

    // ONE pass over docs: stage membership becomes two boolean flags
    // (left joins against the small stage verdict tables), and all
    // three stage aggregates are conditional sums over that single
    // scan — the manifest no longer re-reads the corpus per stage.
    val flagged = docs
      .join(kept, Seq("doc_id"), "left")
      .join(losers, Seq("doc_id"), "left")
      .withColumn("__q", coalesce(col("__q"), lit(false)))
      .withColumn("__curated", col("__q") && col("__l").isNull)

    if (outPath.nonEmpty)
      graft.store.ChunkStore.write(
        flagged.filter(col("__curated")).drop("__q", "__l", "__curated"),
        outPath, Seq("lang"))

    flagged
      .agg(
        count(lit(1)).as("n1"),
        coalesce(sum("n_chars"), lit(0L)).cast("long").as("c1"),
        count(when(col("__q"), 1)).as("n2"),
        coalesce(sum(when(col("__q"), col("n_chars"))), lit(0L))
          .cast("long").as("c2"),
        count(when(col("__curated"), 1)).as("n3"),
        coalesce(sum(when(col("__curated"), col("n_chars"))), lit(0L))
          .cast("long").as("c3"))
      .select(expr(
        """stack(3,
          |  1L, 'input',         n1, c1,
          |  2L, 'after_quality', n2, c2,
          |  3L, 'after_neardup', n3, c3)
          |  AS (stage, name, n_docs, n_chars)""".stripMargin))
      .orderBy("stage")
  }
}
