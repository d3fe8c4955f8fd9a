package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated synthetic tables
  * (`/root/repo/TESTDATA.md`). All engine queries read these via
  * `spark.read.parquet` so Catalyst column pruning / predicate pushdown
  * reach the scan.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` normalized to TimestampType whatever the parquet
    * writer annotated:
    *  - TIMESTAMP(NANOS) reads only as a long
    *    (`spark.sql.legacy.parquet.nanosAsLong=true`, set by every
    *    engine session) — convert with integer division (double
    *    division would lose precision above 2^53 ns);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as
    *    TIMESTAMP_NTZ — cast, which under the session's pinned UTC
    *    timezone maps each naive datetime to the same instant DuckDB's
    *    naive reading uses, keeping oracle rows identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
