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
      .filter(col("keep")).select("doc_id")
    val afterQuality = docs.join(kept, "doc_id")

    // drop non-representative members of every near-dup component
    val losers = Dedup.componentLabels(spark, dir)
      .join(Dedup.qSemdedup(spark, dir)
          .select(col("group_id").as("grp"), col("kept_doc")), "grp")
      .filter(col("doc_id") =!= col("kept_doc"))
      .select("doc_id")
    val curated = afterQuality.join(losers, Seq("doc_id"), "left_anti")

    if (outPath.nonEmpty)
      graft.store.ChunkStore.write(curated, outPath, Seq("lang"))

    def stage(name: String, order: Int, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum("n_chars"), lit(0L)).cast("long").as("n_chars"))
        .select(lit(order.toLong).as("stage"), lit(name).as("name"),
          col("n_docs"), col("n_chars"))
    stage("input", 1, docs)
      .unionByName(stage("after_quality", 2, afterQuality))
      .unionByName(stage("after_neardup", 3, curated))
      .orderBy("stage")
  }
}
