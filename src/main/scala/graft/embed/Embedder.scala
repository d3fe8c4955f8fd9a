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
  /** E2: embed up to one API batch of texts in ONE provider call,
    * results index-aligned with the input (reference
    * `embedding.ts:30-81` `generateEmbeddings`). The default delegates
    * per-text; a real network provider overrides this with its bulk
    * endpoint. Callers must not pass more than their batch size —
    * [[BatchEmbedding.embedAll]] does the splitting (E3). */
  def embedBatch(texts: Seq[String]): Seq[Array[Double]] = texts.map(embed)
}

/** E3: the batch-of-100 splitting contract of the reference's
  * `generateEmbeddingsBatch` (`src/core/embedding/embedding.ts:88-123`):
  * empty input short-circuits, inputs within one batch make exactly one
  * provider call, larger inputs are split into consecutive `batchSize`
  * slices each embedded in one call, with per-batch error context and
  * an optional progress callback after each batch.
  */
object BatchEmbedding {
  val DefaultBatchSize = 100

  def embedAll(provider: EmbeddingProvider, texts: Seq[String],
      batchSize: Int = DefaultBatchSize,
      onProgress: (Int, Int) => Unit = null): Seq[Array[Double]] = {
    if (texts.isEmpty) return Nil
    if (texts.length <= batchSize) return provider.embedBatch(texts)
    val out = Seq.newBuilder[Array[Double]]
    var done = 0
    texts.grouped(batchSize).zipWithIndex.foreach { case (batch, i) =>
      val vecs =
        try provider.embedBatch(batch)
        catch {
          case e: Exception =>
            throw new RuntimeException(
              s"Failed to generate embeddings for batch ${i + 1}", e)
        }
      require(vecs.length == batch.length,
        s"provider returned ${vecs.length} vectors for ${batch.length} texts")
      out ++= vecs
      done += batch.length
      if (onProgress != null) onProgress(done, texts.length)
    }
    out.result()
  }
}

object Embedder extends EmbeddingProvider {

  /** 64 matches the driver's `embeddings` table; the reference default
    * is 768 (`src/core/vector-db/constants.ts:6`) — configurable. */
  val DefaultDim = 64
  def dim: Int = DefaultDim

  /** The default hashing embedder at a non-default dimension, as a
    * provider (so the pipeline's `dim` knob and the provider seam
    * compose). */
  def withDim(d: Int): EmbeddingProvider =
    if (d == DefaultDim) this
    else new EmbeddingProvider {
      val dim: Int = d
      def embed(text: String): Array[Double] = Embedder.embed(text, d)
    }

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

  /** Portable hash as a column — the native codegen'd
    * [[graft.functions.Hash60]] (registered by GraftExtensions;
    * bit-identical to the `conv(first 15 md5 hex, 16, 10)` composite
    * the oracles validate, without the hex/conv string detour). */
  def hash60Col(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_hash60", c)

  /** The builtin-composite formulation — the reference implementation
    * Hash60Spec pins the native function against. */
  private[graft] def hash60ColComposite(c: Column): Column =
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
