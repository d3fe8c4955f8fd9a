package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.chunk.Chunker

/** Ingestion-side operators: the chunking UDTFs (SURVEY.md §2.9) applied
  * over the `documents` table. Chunkers are pure Scala `flatMap`s on a
  * typed Dataset — a narrow transformation: at 100 TB this stays
  * shuffle-free and scales linearly with input splits (reference C1,
  * `src/core/chunk/chunking.ts:42-108`).
  */
object Ingest {

  /** C1 fixed sliding-window chunking (size 100 / overlap 20 so the
    * synthetic docs split into ~4 chunks each). `preserveWords=false`
    * keeps the oracle SQL exact; word-snap semantics are covered by
    * ChunkerSpec. */
  def qChunkFixed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        Chunker.chunk(text, size = 100, overlap = 20, preserveWords = false)
          .map(p => (id, p.index.toLong, p.content, p.start.toLong, p.end.toLong))
      }
      .toDF("doc_id", "chunk_index", "content", "chunk_start", "chunk_end")
      .orderBy("doc_id", "chunk_index")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_fixed" -> (qChunkFixed _),
  )

  /** DuckDB mirror of the chunker: windows on the step grid, trim, skip
    * empty windows without consuming an index, stop once a window
    * reaches the end (validated row-for-row against the Scala chunker). */
  val oracles: Map[String, String] = Map(
    "q_chunk_fixed" ->
      """WITH doc AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |single AS (
        |  SELECT doc_id, 0::BIGINT AS chunk_index, text AS content,
        |         0::BIGINT AS chunk_start, len AS chunk_end
        |  FROM doc WHERE len <= 100),
        |w AS (
        |  SELECT doc_id, k, k*80 AS s, least(k*80+100, len) AS e,
        |         trim(substring(text, k*80+1, 100)) AS content
        |  FROM doc, LATERAL (SELECT unnest(generate_series(0, len//80)) AS k) g
        |  WHERE len > 100 AND k*80 < len AND (k = 0 OR (k-1)*80+100 < len)),
        |multi AS (
        |  SELECT doc_id,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY k) - 1 AS chunk_index,
        |         content, s AS chunk_start, e AS chunk_end
        |  FROM w WHERE content <> '')
        |SELECT * FROM single UNION ALL SELECT * FROM multi
        |ORDER BY doc_id, chunk_index""".stripMargin,
  )
}
