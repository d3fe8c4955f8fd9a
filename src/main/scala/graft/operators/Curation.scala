package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.Embedder.hash60Col
import graft.operators.TextAnalysis.toks

/** Corpus-curation operators — the steps a training-data pipeline runs
  * between dedup ([[Dedup]]) and batching: deterministic train/val/test
  * splitting, repetition-based quality filtering (the Gopher/C4 rule
  * family), and sequence packing into fixed token budgets.
  *
  * Scale design: everything is a narrow per-row expression or a
  * (doc_id, gram)-keyed shuffle; the split is a pure hash of the row
  * key (no global state, re-runnable on any partitioning); packing
  * windows are partitioned by `source` so state never crosses a shard
  * boundary — at 100 TB each shard packs independently.
  */
object Curation {

  /** Deterministic corpus split: md5-hash each doc_id into 100 buckets
    * (80/10/10), then per-split × language counts and char totals. The
    * hash is the portable `hash60` (same literal arithmetic both
    * engines), so membership is reproducible forever — the property a
    * training pipeline needs so later runs never leak val/test docs
    * into train. */
  def qDataSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket",
        pmod(hash60Col(concat(lit("split:"), col("doc_id").cast("string"))),
          lit(100)))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
          .as("avg_chars"))
      .orderBy("split", "lang")

  /** Gopher-style repetition quality filters: fraction of bigram mass
    * held by the most frequent bigram, and fraction of trigrams that
    * are repeats. Both are quotients of exact integer counts. The
    * `keep` flag applies the standard thresholds (drop if the top
    * bigram exceeds 18% of the text or >30% of trigrams repeat).
    * Shape: explode → (doc_id, gram) count → per-doc aggregate — two
    * hash shuffles keyed by doc_id, linear in corpus size. */
  def qQualityRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("t", toks(col("text")))
      .filter(size(col("t")) >= 3)
    def grams(n: Int) = docs.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("t")) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("t"), i + j)): _*)))
        .as("g"))
    val bi = grams(2)
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("max_bigram"))
    val tri = grams(3)
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_trigrams"), count(lit(1)).as("n_tri_distinct"))
    bi.join(tri, "doc_id")
      .withColumn("top_bigram_frac",
        round(col("max_bigram").cast("double") / col("n_bigrams"), 6))
      .withColumn("dup_trigram_frac",
        round((col("n_trigrams") - col("n_tri_distinct")).cast("double") /
          col("n_trigrams"), 6))
      .withColumn("keep",
        col("top_bigram_frac") <= 0.18 && col("dup_trigram_frac") <= 0.3)
      .select("doc_id", "n_bigrams", "max_bigram", "top_bigram_frac",
        "dup_trigram_frac", "keep")
      .orderBy("doc_id")
  }

  /** Tokens per packing bin. */
  private[graft] val PackCapacity = 512

  /** Sequence packing (concatenate-then-chunk): docs are laid out in
    * doc_id order within each source shard; a doc starts the bin its
    * running start-offset falls in (`floor(start / capacity)`). Emits
    * per-bin document counts and token totals. One window + one groupBy
    * per shard — bins never cross shards, so 1000 executors pack 1000
    * shards with zero coordination. */
  def qPackBatches(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(toks(col("text"))).cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("tok")) / PackCapacity))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("source", "bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_data_split"   -> (qDataSplit _),
    "q_quality_rep"  -> (qQualityRepetition _),
    "q_pack_batches" -> (qPackBatches _),
  )

  private val toksSql =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"

  val oracles: Map[String, String] = Map(
    "q_data_split" ->
      """WITH b AS (
        |  SELECT lang, n_chars,
        |    ('0x'||substr(md5('split:'||doc_id::VARCHAR),1,15))::BIGINT % 100 AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT CASE WHEN bucket < 80 THEN 'train'
        |              WHEN bucket < 90 THEN 'val'
        |              ELSE 'test' END AS split, lang, n_chars
        |  FROM b)
        |SELECT split, lang, count(*) AS n_docs,
        |  sum(n_chars)::BIGINT AS total_chars,
        |  round(sum(n_chars)::DOUBLE / count(*), 6) AS avg_chars
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q_quality_rep" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS tk FROM documents),
         |f AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 3),
         |bi AS (
         |  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
         |  FROM f, LATERAL (SELECT unnest(range(1, len(tk))) AS i) u),
         |bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
         |bia AS (
         |  SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS max_bigram
         |  FROM bic GROUP BY doc_id),
         |tri AS (
         |  SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
         |  FROM f, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) u),
         |tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
         |tria AS (
         |  SELECT doc_id, sum(c)::BIGINT AS n_trigrams,
         |    count(*) AS n_tri_distinct
         |  FROM tric GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, max_bigram,
         |  round(max_bigram::DOUBLE / n_bigrams, 6) AS top_bigram_frac,
         |  round((n_trigrams - n_tri_distinct)::DOUBLE / n_trigrams, 6)
         |    AS dup_trigram_frac,
         |  (round(max_bigram::DOUBLE / n_bigrams, 6) <= 0.18 AND
         |   round((n_trigrams - n_tri_distinct)::DOUBLE / n_trigrams, 6) <= 0.3)
         |    AS keep
         |FROM bia JOIN tria USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_pack_batches" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, len($toksSql)::BIGINT AS tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, tok,
         |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |b AS (
         |  SELECT source, CAST(floor((cum - tok) / $PackCapacity) AS BIGINT) AS bin,
         |    doc_id, tok
         |  FROM c)
         |SELECT source, bin, count(*) AS n_docs, sum(tok)::BIGINT AS bin_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM b GROUP BY source, bin ORDER BY source, bin""".stripMargin,
  )
}
