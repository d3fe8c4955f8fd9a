package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed chunk/source store — the engine's analogue of the
  * reference's VectorDBAdapter surface (S7-S10,
  * `src/core/vector-db/adapters/sqlite-storage-operations.ts:60-177`),
  * re-expressed as batch-columnar operations:
  *
  *  - insert/insertBatch → partitioned parquet append (the reference
  *    loops row-by-row per insert, common-operations.ts:4-31 — an
  *    anti-pattern documented in SURVEY.md §4)
  *  - delete/deleteBatch → anti-join rewrite (S9)
  *  - update/upsert      → union + keep-latest window (S8)
  *  - get                → predicate-pushdown point lookup (S10)
  *
  * Scale notes: data is partitioned by a low-cardinality column
  * (sourceType/lang) so partition pruning applies; rewrites are staged
  * to a fresh directory (never in-place) — at 100 TB you'd swap the
  * staged output in atomically via a table format (Delta/Iceberg), but
  * the dataflow is identical.
  */
object ChunkStore {

  /** Default format is parquet (columnar, statistics, pushdown); json/
    * csv supported for interchange — same layout, same operations. */
  def write(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq.empty,
      mode: SaveMode = SaveMode.Overwrite,
      format: String = "parquet"): Unit = {
    val w = df.write.mode(mode).format(format)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  def read(spark: SparkSession, path: String,
      format: String = "parquet"): DataFrame =
    spark.read.format(format).load(path)

  /** Point lookup — pushdown-friendly (S10). */
  def get(spark: SparkSession, path: String, idCol: String, id: Any): DataFrame =
    read(spark, path).filter(col(idCol) === lit(id))

  /** Bucketed table write — the co-located-join layout for keys the
    * store is joined/aggregated on repeatedly (doc_id, source_id).
    * `bucketBy(n, key) + sortBy(key)` records the hash partitioning in
    * catalog metadata, so ANY later equi-join or aggregation on the
    * key between same-bucketed tables plans with ZERO Exchange — at
    * 100 TB that converts every recurring join from a two-sided
    * shuffle of the full store into a per-bucket local merge. Parquet
    * path reads can't carry bucket info (it lives in table metadata,
    * not files), hence `saveAsTable`; production would keep this in a
    * shared metastore / table format. Bucket count is a layout
    * constant: pick it once per store (≈ store size / target task
    * size) — co-location needs both sides bucketed the SAME way. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** S9 delete-batch as an anti-join rewrite, staged to `dst`. */
  def deleteInto(spark: SparkSession, src: String, dst: String,
      ids: DataFrame, idCol: String): Unit = {
    val keep = read(spark, src)
      .join(broadcast(ids.select(col(idCol))), Seq(idCol), "left_anti")
    write(keep, dst)
  }

  /** Compaction: rewrite a store into `files` evenly-sized parquet
    * files (repartition, not coalesce — coalesce skews when upstream
    * partitioning is uneven). Streaming appends (foreachBatch) create
    * one file per micro-batch per partition; at 100 TB periodic
    * compaction is what keeps scan task counts sane. */
  def compactInto(spark: SparkSession, src: String, dst: String,
      files: Int): Unit =
    write(read(spark, src).repartition(files), dst)

  /** S8 upsert as union + keep-latest per key (ordered by `versionCol`
    * desc), staged to `dst`. */
  def upsertInto(spark: SparkSession, src: String, dst: String,
      updates: DataFrame, idCol: String, versionCol: String): Unit = {
    val w = Window.partitionBy(idCol).orderBy(desc(versionCol))
    val merged = read(spark, src).unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    write(merged, dst)
  }
}
