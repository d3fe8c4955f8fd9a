package graft.model

/** Core data model of the engine — the Spark rendering of the reference's
  * record types (VectorDocument / DocumentMetadata / ChunkWithMetadata,
  * reference `src/core/vector-db/adapters/types.ts:8-61` and
  * `src/core/chunk/chunking.ts:23-36`).
  */

/** Semantic boundary attached to a chunk by boundary-aware chunking. */
case class Boundary(
    boundaryType: String,
    level: Option[Int] = None,
    name: Option[String] = None,
    title: Option[String] = None,
    startLine: Option[Int] = None,
    endLine: Option[Int] = None)

/** A chunker output piece: character offsets are into the original text. */
case class ChunkPiece(
    content: String,
    index: Int,
    start: Int,
    end: Int,
    boundary: Option[Boundary] = None)

/** Source-identity metadata carried on every chunk (struct column —
  * Catalyst prunes / pushes down on the nested fields natively). */
case class DocMeta(
    sourceType: String,
    title: Option[String] = None,
    url: Option[String] = None,
    description: Option[String] = None,
    filePath: Option[String] = None,
    owner: Option[String] = None,
    repo: Option[String] = None,
    branch: Option[String] = None,
    path: Option[String] = None,
    gistId: Option[String] = None)

/** A stored chunk row — the engine's `documents` table. Embeddings live
  * in the same row (columnar parquet makes the reference's separate
  * vec_documents rowid-join unnecessary). */
case class Chunk(
    id: String,
    sourceId: String,
    chunkIndex: Int,
    totalChunks: Int,
    content: String,
    embedding: Array[Float],
    metadata: DocMeta,
    boundary: Option[Boundary],
    createdAt: java.sql.Timestamp)

/** The un-chunked original document, stored once per source (1→N chunks). */
case class SourceRec(
    sourceId: String,
    originalContent: String,
    title: Option[String],
    url: Option[String],
    sourceType: String,
    createdAt: java.sql.Timestamp)

/** Search output: chunk + similarity score (= cosine, 1-based like the
  * reference's `1 - distance`). */
case class SearchResult(
    id: String,
    sourceId: String,
    chunkIndex: Int,
    content: String,
    score: Double,
    sourceType: String)
