package graft
package operators

/** LSH / IVF index geometry for the [[Ann]] family — the r7 verdict's
  * "scale-parameterize the ANN geometry" item: plane count (and with
  * it bucket count), LSH table count, and IVF cell count are
  * CONFIGURATION with corpus-size-derived defaults, not constants.
  *
  * Why it matters: bucket-mate candidate volume for the kNN-join
  * family is Σ_b n_b² ≈ N²/2^planes. A fixed plane count makes that
  * quadratic in N at every scale; planes that grow with log2(N) keep
  * the EXPECTED bucket occupancy — and with it per-vector candidate
  * count — constant, so total candidate volume grows linearly.
  *
  * Recall at higher plane counts comes from banded multi-table LSH
  * (the standard OR-of-ANDs construction: `tables` independent
  * hyperplane sets; two vectors are candidates iff they collide in
  * ANY table). Each added plane halves a single table's collision
  * probability for a fixed-angle pair; each added table restores it
  * as 1-(1-p^planes)^tables. The reference reaches the same
  * recall/scan trade-off through its HNSW index option
  * (`/root/reference/src/core/vector-db/adapters/duckdb-adapter.ts:358-412`);
  * this is the shuffle-native equivalent.
  */
final case class AnnGeometry(planes: Int, tables: Int, ivfCells: Int) {
  require(planes >= 1 && planes <= 24, s"planes out of range: $planes")
  require(tables >= 1 && tables <= 16, s"tables out of range: $tables")
  require(ivfCells >= 1, s"ivfCells out of range: $ivfCells")
  /** Buckets per LSH table. */
  def buckets: Long = 1L << planes
}

object AnnGeometry {

  /** The registry-pinned test geometry: every `SparkEntry` ANN query
    * runs at exactly this configuration, and the DuckDB oracle rows
    * are hash-exact against it (4 planes + Hamming-1 probing is the
    * tuned operating point for the clustered synthetic embeddings —
    * see [[Ann.qAnnRecall]]). Scale jobs pass [[forCorpus]] instead. */
  val Pinned: AnnGeometry = AnnGeometry(planes = 4, tables = 1, ivfCells = 8)

  /** Corpus-size-derived geometry targeting constant expected bucket
    * occupancy: planes = ceil(log2(N / targetOccupancy)) — so candidate
    * volume per vector stays ~targetOccupancy·tables as N grows — and
    * IVF cells ≈ sqrt(N) (the standard IVF nlist rule: probe cost
    * N/cells balances codebook cost cells). Never returns fewer
    * planes/cells than [[Pinned]]; floors keep tiny corpora on the
    * tuned test geometry. */
  def forCorpus(n: Long, targetOccupancy: Long = 64,
      tables: Int = 2): AnnGeometry = {
    require(n > 0 && targetOccupancy > 0)
    val wantBuckets = math.max(1L, n / targetOccupancy)
    val planes = math.min(24, math.max(Pinned.planes,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, wantBuckets - 1))))
    val cells = math.min(1 << 20, math.max(Pinned.ivfCells,
      java.lang.Long.highestOneBit(
        math.max(1L, math.sqrt(n.toDouble).toLong)).toInt))
    AnnGeometry(planes, tables, cells)
  }
}
