package graft.embed

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.sql.DataFrame

/** MLlib batch-embedding pipeline: RegexTokenizer → HashingTF → IDF →
  * L2 Normalizer. This is the "real local model" slot behind the same
  * embedding contract as [[Embedder]] (the md5-hashing embedder stays
  * the correctness oracle because it is portable to DuckDB; this one
  * is the throughput path — all four stages are narrow, codegen'd or
  * vectorized, and the only global state is the tiny IDF vector,
  * broadcast by MLlib).
  *
  * Reference: gistdex calls Google gemini-embedding-001 over HTTPS
  * per 100-doc batch (`src/core/embedding/embedding.ts:88-123`); at
  * 100 TB an external API is the bottleneck, a local MLlib pipeline
  * is not.
  */
object MLlibEmbedder {

  val DefaultDim = 768

  /** Fit-and-transform: adds `outCol` (unit-L2 SparseVector of dim). */
  def embed(df: DataFrame, textCol: String, outCol: String,
      dim: Int = DefaultDim): DataFrame = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__tf").setNumFeatures(dim)
    val idf = new IDF().setInputCol("__tf").setOutputCol("__tfidf")
    val norm = new Normalizer()
      .setInputCol("__tfidf").setOutputCol(outCol).setP(2.0)
    new Pipeline().setStages(Array(tok, tf, idf, norm))
      .fit(df).transform(df)
      .drop("__tokens", "__tf", "__tfidf")
  }
}
