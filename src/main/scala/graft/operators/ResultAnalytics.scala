package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.chunk.Chunker
import graft.operators.Search.{docVecCte, matchesSql, queryScoreCte, scoredDocs}
import graft.operators.TextAnalysis.toks

/** Result-set analytics and composite retrieval pipelines: keyword
  * coverage (reference A10, `metadata-generator.ts:123-155`), semantic
  * coherence + Simpson diversity (A11, `metadata-generator.ts:160-242`),
  * pairwise-Jaccard redundancy (A12, `agent-query-tool.ts:257-271`),
  * the multi-stage query chain with keep-best dedup (Q5 + J6,
  * `query-chain.ts:79-272,51-74`), and lossless overlap-strip chunk
  * reassembly (W3/Q3, `search.ts:193-228`).
  *
  * These run over top-k result sets (tiny), so the analytics cost is
  * O(k²) at most regardless of corpus size; the corpus-side work is
  * the shared cached scored scan. Coherence/diversity use integer sum
  * identities (1 − Σc²/t² instead of Σp²) so no float accumulation
  * order can perturb the result.
  */
object ResultAnalytics {

  val ChainQueryB = "join merge stream"

  /** Top-10 result set for one query — cached; the coverage/coherence/
    * redundancy/chain analytics all read the same tiny result. */
  private def topDocs(spark: SparkSession, dir: String, k: Int,
      text: String = Search.QueryText): DataFrame =
    if (k == 10)
      Cache.getOrBuild(spark, s"top10:$text", dir) {
        scoredDocs(spark, dir, text)
          .orderBy(desc("score"), col("doc_id")).limit(k)
      }
    else
      scoredDocs(spark, dir, text)
        .orderBy(desc("score"), col("doc_id")).limit(k)

  /** A10 keyword coverage: which query keywords appear in the top-10
    * result contents, and in how many. */
  def qKeywordCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kw = Search.QueryText.split(" ").toSeq.toDF("keyword")
    topDocs(spark, dir, 10)
      .join(Tables.documents(spark, dir), "doc_id")
      .crossJoin(broadcast(kw))
      .groupBy("keyword")
      .agg(
        sum(when(col("text").contains(col("keyword")), 1L).otherwise(0L)).as("n_docs"),
        count(lit(1)).as("n_results"))
      .withColumn("coverage", round(col("n_docs").cast("double") / col("n_results"), 6))
      .withColumn("covered", col("n_docs") > 0)
      .select("keyword", "n_docs", "coverage", "covered")
      .orderBy("keyword")
  }

  /** A11 semantic coherence over the top-10 result contents:
    * shared-vocabulary ratio + Simpson diversity, via exact integer
    * sums (1 − Σc²/t²). */
  def qCoherence(spark: SparkSession, dir: String): DataFrame =
    topDocs(spark, dir, 10)
      .join(Tables.documents(spark, dir), "doc_id")
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .agg(
        count(lit(1)).as("vocab"),
        count(when(col("c") > 1, lit(1))).as("shared"),
        sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("sumsq"))
      .select(col("vocab"), col("shared"),
        round(col("shared").cast("double") / col("vocab"), 6).as("coherence"),
        round((col("total") * col("total") - col("sumsq")).cast("double") /
          (col("total") * col("total")).cast("double"), 6).as("simpson"))

  /** A12 redundancy: pairwise token-set Jaccard across the top-10
    * results (45 pairs, exact integer set sizes). */
  def qRedundancy(spark: SparkSession, dir: String): DataFrame = {
    val sets = topDocs(spark, dir, 10)
      .join(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("tok"))
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    sets.select(col("doc_id").as("doc_a"), col("tok"))
      .join(sets.select(col("doc_id").as("doc_b"), col("tok")), "tok")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
      .withColumn("uni", col("sza") + col("szb") - col("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 6))
      .select("doc_a", "doc_b", "inter", "uni", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** A11 topic clusters: top-5 non-stop-word topics across the top-10
    * results, with member doc ids and confidence = members/results
    * (reference metadata-generator.ts:160-242, cluster part). */
  def qTopicClusters(spark: SparkSession, dir: String): DataFrame = {
    val members = topDocs(spark, dir, 10)
      .join(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("topic"))
      .filter(!col("topic").isin("the", "a"))
    members.groupBy("topic")
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(array_sort(collect_set(col("doc_id"))),
          x => x.cast("string")), ",").as("members"))
      .withColumn("confidence", round(col("n_docs").cast("double") / 10, 6))
      .orderBy(desc("n_docs"), col("topic"))
      .limit(5)
  }

  /** Q5 multi-stage query chain: two semantic stages, results unioned
    * and deduped keep-best per doc (J6 window), global top-10. */
  def qQueryChain(spark: SparkSession, dir: String): DataFrame = {
    val a = topDocs(spark, dir, 10).withColumn("stage", lit(1L))
    val b = topDocs(spark, dir, 10, ChainQueryB).withColumn("stage", lit(2L))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("stage"))
    a.unionByName(b)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "score", "stage")
      .orderBy(desc("score"), col("doc_id"))
      .limit(10)
  }

  /** W3/Q3 lossless reassembly: raw-window chunking (size 100, overlap
    * 20) then overlap-strip concatenation per doc; `ok` asserts the
    * round trip reproduces the original byte-for-byte. */
  def qReassemble(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chunks = Tables.documents(spark, dir)
      .select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        Chunker.chunkRaw(text, size = 100, overlap = 20)
          .map(p => (id, p.index.toLong, p.content))
      }
      .toDF("doc_id", "chunk_index", "content")
    val rec = chunks
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("chunk_index"), col("content")))),
          x => when(x.getField("chunk_index") === 0, x.getField("content"))
            .otherwise(x.getField("content")
              .substr(lit(21), length(x.getField("content")))))).as("reassembled"))
    rec.join(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), col("n_chunks"),
        (col("reassembled") === col("text")).as("ok"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_keyword_coverage" -> (qKeywordCoverage _),
    "q_coherence"        -> (qCoherence _),
    "q_redundancy"       -> (qRedundancy _),
    "q_topic_clusters"   -> (qTopicClusters _),
    "q_query_chain"      -> (qQueryChain _),
    "q_reassemble"       -> (qReassemble _),
  )

  private val topkCte =
    s"""$docVecCte,
       |${queryScoreCte("", Search.QueryText)},
       |topk AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_keyword_coverage" ->
      s"""WITH $topkCte
         |SELECT keyword,
         |  sum(CASE WHEN contains(d.text, keyword) THEN 1 ELSE 0 END)::BIGINT AS n_docs,
         |  round(sum(CASE WHEN contains(d.text, keyword) THEN 1 ELSE 0 END)::DOUBLE
         |        / count(*), 6) AS coverage,
         |  sum(CASE WHEN contains(d.text, keyword) THEN 1 ELSE 0 END) > 0 AS covered
         |FROM topk t
         |JOIN documents d USING (doc_id)
         |CROSS JOIN (VALUES ('table'), ('scan'), ('fast')) kw(keyword)
         |GROUP BY keyword ORDER BY keyword""".stripMargin,
    "q_coherence" ->
      s"""WITH $topkCte,
         |tw AS (
         |  SELECT tok FROM topk JOIN documents d USING (doc_id),
         |    LATERAL (SELECT unnest(regexp_split_to_array(lower(d.text), '\\s+')) AS tok) u
         |  WHERE tok <> ''),
         |wc AS (SELECT tok, count(*) AS c FROM tw GROUP BY 1)
         |SELECT count(*) AS vocab,
         |  count(*) FILTER (WHERE c > 1) AS shared,
         |  round((count(*) FILTER (WHERE c > 1))::DOUBLE / count(*), 6) AS coherence,
         |  round((sum(c)::BIGINT * sum(c)::BIGINT - sum(c*c)::BIGINT)::DOUBLE
         |        / (sum(c)::BIGINT * sum(c)::BIGINT)::DOUBLE, 6) AS simpson
         |FROM wc""".stripMargin,
    "q_redundancy" ->
      s"""WITH $topkCte,
         |sets AS (
         |  SELECT DISTINCT doc_id, tok FROM topk JOIN documents d USING (doc_id),
         |    LATERAL (SELECT unnest(regexp_split_to_array(lower(d.text), '\\s+')) AS tok) u
         |  WHERE tok <> ''),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sets a JOIN sets b USING (tok)
         |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, sa.sz + sb.sz - inter AS uni,
         |  round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
         |FROM pairs
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_topic_clusters" ->
      s"""WITH $topkCte,
         |membership AS (
         |  SELECT DISTINCT tok AS topic, doc_id
         |  FROM topk JOIN documents d USING (doc_id),
         |    LATERAL (SELECT unnest(regexp_split_to_array(lower(d.text), '\\s+')) AS tok) u
         |  WHERE tok <> '' AND tok NOT IN ('the','a'))
         |SELECT topic, count(*) AS n_docs,
         |  string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS members,
         |  round(count(*)::DOUBLE / 10, 6) AS confidence
         |FROM membership GROUP BY topic
         |ORDER BY n_docs DESC, topic LIMIT 5""".stripMargin,
    "q_query_chain" ->
      s"""WITH $docVecCte,
         |${queryScoreCte("s1", Search.QueryText)},
         |${queryScoreCte("s2", ChainQueryB)},
         |ua AS (SELECT doc_id, score, 1::BIGINT AS stage FROM s1sc
         |       ORDER BY score DESC, doc_id LIMIT 10),
         |ub AS (SELECT doc_id, score, 2::BIGINT AS stage FROM s2sc
         |       ORDER BY score DESC, doc_id LIMIT 10),
         |u AS (SELECT * FROM ua UNION ALL SELECT * FROM ub),
         |dd AS (
         |  SELECT doc_id, score, stage,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, stage) AS rn
         |  FROM u)
         |SELECT doc_id, score, stage FROM dd WHERE rn = 1
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q_reassemble" ->
      """WITH doc AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |ch AS (
        |  SELECT doc_id, 0::BIGINT AS idx, text AS content FROM doc WHERE len <= 100
        |  UNION ALL
        |  SELECT doc_id, k::BIGINT AS idx, substring(text, k*80+1, 100) AS content
        |  FROM doc, LATERAL (SELECT unnest(range(0, (len+79)//80)) AS k) g
        |  WHERE len > 100 AND k*80 < len AND (k = 0 OR (k-1)*80+100 < len))
        |SELECT c.doc_id, count(*) AS n_chunks,
        |  (string_agg(CASE WHEN idx = 0 THEN content ELSE substring(content, 21) END,
        |              '' ORDER BY idx) = d.text) AS ok
        |FROM ch c JOIN doc d USING (doc_id)
        |GROUP BY c.doc_id, d.text ORDER BY c.doc_id""".stripMargin,
  )
}
