package graft.embed

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic local embedder: hashing term-frequency, L2-normalized
  * (the engine's default model, replacing the reference's network call
  * to gemini-embedding-001 — E1-E3, `src/core/embedding/embedding.ts`;
  * the reference's own tests run on a deterministic mock the same way,
  * `tests/helpers/mock-embeddings.ts:9-54`).
  *
  * The hash is md5-based so it is portable: Spark, DuckDB and plain
  * Scala all derive bit-identical buckets, which makes embedding
  * pipelines oracle-checkable end-to-end. A real model drops in behind
  * [[EmbeddingProvider]] without touching the query operators.
  */
trait EmbeddingProvider extends Serializable {
  def dim: Int
  def embed(text: String): Array[Double]
}

object Embedder extends EmbeddingProvider {

  /** 64 matches the driver's `embeddings` table; the reference default
    * is 768 (`src/core/vector-db/constants.ts:6`) — configurable. */
  val DefaultDim = 64
  def dim: Int = DefaultDim

  def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** First 60 bits of md5 as a non-negative long — the portable hash.
    * (15 hex chars so it fits a signed 64-bit in every engine.) */
  def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  def bucketOf(token: String, dim: Int): Int = (hash60(token) % dim).toInt

  def tokenize(text: String): Array[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Driver/executor-side typed path (used by Dataset pipelines). */
  def embed(text: String, dim: Int): Array[Double] = {
    val counts = new Array[Double](dim)
    tokenize(text).foreach(t => counts(bucketOf(t, dim)) += 1.0)
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += counts(i) * counts(i); i += 1 }
    val norm = math.sqrt(ss)
    if (norm == 0.0) counts else counts.map(_ / norm)
  }
  def embed(text: String): Array[Double] = embed(text, DefaultDim)

  // ---- DataFrame path: identical math as Catalyst expressions ----

  /** Portable hash as a column: conv(first 15 md5 hex, 16, 10). */
  def hash60Col(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def bucketCol(token: Column, dim: Int): Column =
    pmod(hash60Col(token), lit(dim.toLong))

  /** Sparse embeddings for a corpus: `(idCol, bucket, weight)` rows with
    * Σ weight² = 1 per id. Weights are quotients of exact integer
    * counts, so they are bit-identical across engines. Wide ops: one
    * shuffle on (id, bucket) + a per-id window — both partition-local
    * after the groupBy, linear at scale. */
  def sparseVectors(df: DataFrame, idCol: String, textCol: String,
      dim: Int = DefaultDim): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol), bucketCol(lower(col("tok")), dim).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("norm",
        sqrt(sum(col("cnt") * col("cnt")).over(Window.partitionBy(col(idCol)))))
      .select(col(idCol), col("bucket"), (col("cnt") / col("norm")).as("weight"))
  }
}
