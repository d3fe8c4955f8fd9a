package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity as pure Catalyst column expressions (reference
  * X3-X6, `src/core/embedding/embedding.ts:143-173`,
  * `src/core/utils/math-utils.ts:4-75`).
  *
  * Everything here stays inside whole-stage codegen (no UDFs): the
  * higher-order functions compile to loops over the array. Elements are
  * cast to double BEFORE multiplication so the arithmetic is IEEE-double
  * left-to-right — bit-identical to DuckDB's `list_dot_product` over
  * `DOUBLE[]`, which the oracles use.
  */
object VectorFunctions {

  private def asDouble(a: Column): Column =
    transform(a, x => x.cast("double"))

  /** Σ aᵢ·bᵢ, summed left-to-right in double — the codegen'd
    * [[DotProduct]] expression (bit-identical to the HOF formulation
    * `aggregate(zip_with(asDouble(a), asDouble(b), _*_), 0.0, _+_)`,
    * which remains available as [[dotHof]] for differential tests). */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Reference HOF formulation of [[dot]] (slow path, kept for
    * equivalence testing). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — `dot / (|a|·|b|)`, the reference's score
    * definition (score = 1 − cosine distance). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine given precomputed norms — avoids recomputing |v| per pair in
    * kNN cross joins (norms are computed once per side, not once per
    * candidate pair). */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** L2-normalize to unit length (reference X5 `normalizeEmbedding`). */
  def normalize(a: Column): Column = {
    val n = l2norm(a)
    transform(asDouble(a), x => x / n)
  }
}
