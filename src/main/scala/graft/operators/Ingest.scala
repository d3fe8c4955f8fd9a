package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.chunk.{ChunkDispatch, Chunker, MarkdownChunker}

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

  /** C2 markdown-boundary chunking over synthesized markdown (the
    * documents table is single-line prose, so headers/sections are
    * derived deterministically from each row). Not SQL-expressible —
    * the oracle replays the committed golden table (see
    * [[graft.GoldenChunks]]); exact semantics are pinned by
    * BoundaryChunkerSpec. */
  def qChunkMarkdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val md = s"# doc $id\n\n${text.take(150)}\n\n## tail\n\n${text.drop(150)}"
        MarkdownChunker.chunk(md, maxSize = 200, overlap = 40).map { p =>
          (id, p.index.toLong,
            p.boundary.map(_.boundaryType).getOrElse(""),
            p.boundary.flatMap(_.title).getOrElse(""),
            // X12: 1-based line numbers from the chunker's offsets
            p.boundary.flatMap(_.startLine).getOrElse(0).toLong,
            p.boundary.flatMap(_.endLine).getOrElse(0).toLong,
            p.content.length.toLong)
        }
      }
      .toDF("doc_id", "chunk_index", "boundary_type", "title",
        "start_line", "end_line", "content_len")
      .orderBy("doc_id", "chunk_index")
  }

  /** C3 + C4 code-boundary chunking over synthesized source: a
    * TypeScript-ish fixture through the regex chunker (C3) and a
    * Python fixture through the structural CST chunker (C4 — real
    * `function_definition` / `class_definition` / import / assignment
    * boundaries with decorator attachment, dispatched via
    * [[graft.chunk.ChunkDispatch]] exactly as an indexed `.py` file
    * is). Oracle = the committed golden table ([[graft.GoldenChunks]]);
    * semantics pinned by BoundaryChunkerSpec and CstChunkerSpec. */
  def qChunkCode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val ts =
          s"""import { a } from 'b'
             |import { c } from 'd'
             |
             |function f$id() {
             |  return "${text.take(100)}"
             |}
             |
             |class C$id {
             |  m() { return "${text.slice(100, 200)}" }
             |}""".stripMargin
        val py =
          s"""import os
             |from typing import List
             |
             |@cache
             |def f$id():
             |    return "${text.take(100)}"
             |
             |class C$id:
             |    def m(self):
             |        return "${text.slice(100, 200)}"
             |
             |SEED_$id = $id""".stripMargin
        def rows(lang: String, path: String, code: String) =
          ChunkDispatch.chunk(code, Some(path), size = 200, overlap = 40,
              preserveBoundaries = true).map { p =>
            (id, lang, p.index.toLong,
              p.boundary.map(_.boundaryType).getOrElse(""),
              p.boundary.flatMap(_.name).getOrElse(""),
              p.content.length.toLong)
          }
        rows("typescript", s"/src/f$id.ts", ts) ++
          rows("python", s"/src/f$id.py", py)
      }
      .toDF("doc_id", "lang", "chunk_index", "boundary_type", "name",
        "content_len")
      .orderBy("doc_id", "lang", "chunk_index")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk_fixed"    -> (qChunkFixed _),
    "q_chunk_markdown" -> (qChunkMarkdown _),
    "q_chunk_code"     -> (qChunkCode _),
  )

  /** DuckDB mirror of the fixed chunker as a reusable CTE chain
    * (windows on the step grid, trim, skip empty windows without
    * consuming an index, stop once a window reaches the end —
    * validated row-for-row against the Scala chunker). Emits
    * `chunks(doc_id, chunk_index, content, chunk_start, chunk_end)`;
    * shared with [[Search]]'s best-passage oracle. */
  val chunkFixedCtes: String =
    """doc AS (SELECT doc_id, text, length(text) AS len FROM documents),
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
      |  FROM w WHERE content <> ''),
      |chunks AS (
      |  SELECT * FROM single UNION ALL SELECT * FROM multi)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_chunk_fixed" ->
      s"""WITH $chunkFixedCtes
         |SELECT * FROM chunks
         |ORDER BY doc_id, chunk_index""".stripMargin,
    // The boundary chunkers are pure Scala and not SQL-expressible;
    // their oracle is the committed golden parquet (generated once by
    // `runMain graft.GoldenChunks`, chunker semantics independently
    // spec-pinned against the reference fixtures). Tagged sf0.01 —
    // the driver's Verify scale factor.
    "q_chunk_markdown" ->
      s"""SELECT * FROM
         |read_parquet('$fixturesDir/chunk_markdown_sf0.01.parquet/*.parquet')
         |ORDER BY doc_id, chunk_index""".stripMargin,
    "q_chunk_code" ->
      s"""SELECT * FROM
         |read_parquet('$fixturesDir/chunk_code_sf0.01.parquet/*.parquet')
         |ORDER BY doc_id, lang, chunk_index""".stripMargin,
  )
}
