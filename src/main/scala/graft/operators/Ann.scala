package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.Embedder.hash60Col
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor operators over the embedding column —
  * the scale path for kNN (`q_knn` / `q_dedup_embed` are the exact
  * brute-force baselines). The reference's ANN story is DuckDB-VSS HNSW
  * (`src/core/vector-db/adapters/duckdb-adapter.ts:358-412`), a
  * single-node index; these are the Spark-native equivalents that
  * partition instead:
  *
  *  - random-hyperplane LSH: 4 md5-seeded sign hyperplanes → 16
  *    buckets; a query probes exactly one bucket, so the candidate scan
  *    is |corpus|/16 on average and the bucketing is a plain hash
  *    shuffle key — at 100 TB the buckets are the partition layout.
  *    (6 planes measured 0 recall@10 on the clustered synthetic
  *    embeddings — q_ann_recall exists precisely to catch that; 4
  *    planes + Hamming-1 probing is the tuned operating point.)
  *  - IVF (inverted-file): 8 coarse centroid cells, assignment =
  *    argmax cosine; a query probes its 2 nearest cells.
  *
  * Determinism: hyperplane signatures use fixed-point (×10⁶, BIGINT)
  * dot products — integer sums are order-independent, so bucket bits
  * are bit-identical across engines and partitionings. Final scoring
  * uses full-precision cosine rounded to 6 dp with id tie-breaks.
  */
object Ann {

  val Planes: Int = AnnGeometry.Pinned.planes
  val Dim = 64

  /** ±1 hyperplane weights from md5 parity — reproducible everywhere.
    * Plane ids index a single global family: multi-table geometries
    * ([[AnnGeometry]]) slice consecutive `planes`-sized runs off it,
    * so table 0 of ANY geometry with `planes = 4` reproduces the
    * pinned bucket values bit-for-bit. */
  private def planeWeights(spark: SparkSession, nPlanes: Int = Planes): DataFrame =
    spark.range(nPlanes).withColumnRenamed("id", "p")
      .crossJoin(spark.range(Dim).withColumnRenamed("id", "d"))
      .withColumn("w",
        when(pmod(hash60Col(concat(col("p").cast("string"), lit(":"),
          col("d").cast("string"))), lit(2)) === 0, 1L).otherwise(-1L))

  /** LSH bucket per vector: `Planes` sign bits of fixed-point
    * hyperplane dots. */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame =
    Cache.getOrBuild(spark, "lshBuckets", dir) {
      val sv = Tables.embeddings(spark, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .withColumn("se", round(col("x").cast("double") * 1000000, 0).cast("long"))
      sv.join(broadcast(planeWeights(spark)), "d")
        .groupBy("vec_id", "p")
        .agg(sum(col("se") * col("w")).as("s"))
        .withColumn("bit", when(col("s") >= 0, 1L).otherwise(0L))
        .groupBy("vec_id")
        .agg(sum(col("bit") * expr("CAST(pow(2, p) AS BIGINT)")).as("bucket"))
    }

  /** Multi-table LSH bucket assignment under an [[AnnGeometry]]:
    * `(vec_id, table, bucket)` — one row per vector per table, each
    * table a disjoint `planes`-sized slice of the global hyperplane
    * family. The pinned geometry delegates to [[lshBuckets]] so the
    * registry path's plan (and cache entry) is untouched. */
  def lshTables(spark: SparkSession, dir: String,
      geo: AnnGeometry): DataFrame =
    if (geo == AnnGeometry.Pinned)
      lshBuckets(spark, dir).withColumn("table", lit(0L))
    else Cache.getOrBuild(spark, s"lshTables_${geo.planes}x${geo.tables}", dir) {
      val sv = Tables.embeddings(spark, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        .withColumn("se", round(col("x").cast("double") * 1000000, 0).cast("long"))
      sv.join(broadcast(planeWeights(spark, geo.planes * geo.tables)), "d")
        .groupBy("vec_id", "p")
        .agg(sum(col("se") * col("w")).as("s"))
        .withColumn("bit", when(col("s") >= 0, 1L).otherwise(0L))
        .withColumn("table", (col("p") / geo.planes).cast("long"))
        .withColumn("pp", pmod(col("p"), lit(geo.planes)))
        .groupBy("vec_id", "table")
        .agg(sum(col("bit") * expr("CAST(pow(2, pp) AS BIGINT)")).as("bucket"))
    }

  /** Cached IVF cell ranking (assignment + probe ranks) — shared by
    * qAnnIvf, qAnnRecall and the index builder. Cell count is geometry
    * ([[ivfRankedG]]); this is the pinned-8-cell view the registry
    * queries ride. */
  private[operators] def ivfRanked(spark: SparkSession, dir: String): DataFrame =
    ivfRankedG(spark, dir, AnnGeometry.Pinned.ivfCells)

  /** [[ivfRanked]] at an arbitrary coarse-cell count: codebook = the
    * first `cells` vectors (deterministic, no-iteration; production
    * swaps in [[qKmeansStep]] output without changing shape). */
  private[graft] def ivfRankedG(spark: SparkSession, dir: String,
      cells: Int): DataFrame =
    Cache.getOrBuild(spark,
      if (cells == 8) "ivfRanked" else s"ivfRanked_$cells", dir) {
      val e = Search.embNormed(spark, dir)
      val c = e.filter(col("vec_id") < cells)
        .select(col("vec_id").as("cell"), col("embedding").as("cv"),
          col("nrm").as("cn"))
      val w = Window.partitionBy("vec_id").orderBy(desc("csim"), col("cell"))
      e.crossJoin(broadcast(c))
        .withColumn("csim",
          round(cosinePrenormed(dot(col("embedding"), col("cv")), col("nrm"), col("cn")), 6))
        .select(col("vec_id"), col("cell"), col("csim"))
        .withColumn("rn", row_number().over(w))
    }

  /** ANN query via LSH: probe the query vector's bucket, exact-rescore
    * inside it, top-10. */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val buckets = lshBuckets(spark, dir)
    val qb = buckets.filter(col("vec_id") === 0).select(col("bucket"))
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    buckets.join(broadcast(qb), "bucket")
      .filter(col("vec_id") =!= 0)
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("bucket"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** IVF: assign every vector to its nearest of 8 coarse centroids
    * (vec_id < 8 as the deterministic codebook), probe the query's 2
    * nearest cells, exact-rescore, top-10. */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val ranked = ivfRanked(spark, dir)
    val assign = ranked.filter(col("rn") === 1).select("vec_id", "cell")
    val probe = ranked.filter(col("vec_id") === 0 && col("rn") <= 2)
      .select(col("cell"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    assign.join(broadcast(probe), "cell")
      .filter(col("vec_id") =!= 0)
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("cell"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** FILTERED ANN serving — the pre-filter/post-filter problem every
    * production vector store has to solve (Milvus/Qdrant filtered
    * search): a metadata predicate (`label = 3`, ~10% selective)
    * combined with kNN. Post-filtering the unfiltered top-k returns
    * an UNDERFULL list (k·selectivity survivors in expectation);
    * correct serving applies the predicate to the probed CANDIDATES
    * before the top-k — exact k results among matching vectors — and
    * widens the probe (nprobe 4 vs the unfiltered 2) because the
    * predicate thins every cell, the standard selectivity-aware
    * adjustment. At 100 TB the label predicate pushes into the
    * cell-partitioned index scan (label as a secondary partition /
    * row-group stats column), so filtering happens AT THE SCAN, not
    * after candidate materialization. AnnSpec pins the underfull
    * post-filter against this exact-k pre-filter. */
  def qAnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val ranked = ivfRanked(spark, dir)
    val assign = ranked.filter(col("rn") === 1).select("vec_id", "cell")
    val probe = ranked.filter(col("vec_id") === 0 && col("rn") <= 4)
      .select(col("cell"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    assign.join(broadcast(probe), "cell")
      .filter(col("vec_id") =!= 0)
      .join(e.filter(col("label") === 3), "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("cell"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** Batch ANN serving through the IVF index: 8 query vectors probe
    * their 2 nearest cells in ONE job. The reference's serving loop
    * (one kNN call per query) collapses the same way its CI search
    * loop does for text queries (q_search_fanout): queries join the
    * cell-keyed assignment table, candidates rescore exactly, a window
    * takes top-5 per query. At 100 TB the assignment is the
    * cell-partitioned prebuilt index ([[buildIndexes]]) and each probe
    * reads only its cells' partitions — query count scales the
    * broadcast side, never the corpus scans. */
  def qAnnIvfBatch(spark: SparkSession, dir: String): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val ranked = ivfRanked(spark, dir)
    val assign = ranked.filter(col("rn") === 1).select("vec_id", "cell")
    val probes = ranked.filter(col("vec_id") < 8 && col("rn") <= 2)
      .select(col("vec_id").as("query_id"), col("cell"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), col("vec_id"))
    assign.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .join(e, "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** Delta-segment ANN serving — the growing-segment pattern every
    * production vector store uses (FAISS/Milvus sealed+growing
    * segments, Lucene's in-memory buffer): the IVF index covers the
    * vectors that existed at build time; vectors that arrived since
    * (the newest 10% of ids here) form an unindexed DELTA that is
    * brute-force-scanned and merged into the same top-k. Freshness
    * without rebuild: the nightly [[buildIndexes]] job re-seals the
    * delta, exactly the "build once, probe daily" split q_incr_dedup
    * runs for dedup.
    *
    * Scale shape: the indexed side reads only the query's 2 probe
    * cells (2/8 of the sealed corpus, cell = partition key); the
    * delta side is a full scan of the delta ONLY — bounded by ingest
    * rate between index builds, not corpus size. The segment boundary
    * is a broadcast aggregate row, never a driver scalar, and the
    * merged top-10 lowers to TakeOrderedAndProject. */
  def qAnnDelta(spark: SparkSession, dir: String): DataFrame =
    annDeltaServe(spark, dir, tombstones = None)

  /** Tombstoned sealed+delta serve — the DELETE half of the
    * growing-segment lifecycle ([[qAnnDelta]] is the insert half;
    * Lucene live-docs / the Milvus delete buffer): deletes never
    * rewrite the sealed index — they accumulate as an id table, and
    * the serve anti-joins the CANDIDATE set against it BEFORE the
    * top-k, so the k results are exact over survivors rather than a
    * post-filtered underfull list. Tombstone volume is
    * delete-rate-bounded between compactions, never corpus-bounded.
    * The registry variant plants a deterministic tombstone set
    * (vec_id ≡ 1 mod 5) so the serve is oracle-checkable; the
    * artifact path ([[writeTombstones]] → [[probeIvfDeltaLive]] →
    * [[resealWithTombstones]]) is pinned in AnnSealSpec. */
  def qAnnTombstone(spark: SparkSession, dir: String): DataFrame = {
    val tomb = Search.embNormed(spark, dir)
      .select("vec_id").filter(col("vec_id") % 5 === 1)
    annDeltaServe(spark, dir, tombstones = Some(tomb))
  }

  private def annDeltaServe(spark: SparkSession, dir: String,
      tombstones: Option[DataFrame]): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val cut = deltaCutoff(e)
    val ranked = ivfRanked(spark, dir)
    val probe = ranked.filter(col("vec_id") === 0 && col("rn") <= 2)
      .select(col("cell"))
    val idx = ranked.filter(col("rn") === 1).select("vec_id", "cell")
      .join(broadcast(probe), "cell")
      .crossJoin(broadcast(cut))
      .filter(col("vec_id") < col("cutoff") && col("vec_id") =!= 0)
      .select(col("vec_id"), lit("indexed").as("segment"))
    val del = e.select("vec_id").crossJoin(broadcast(cut))
      .filter(col("vec_id") >= col("cutoff"))
      .select(col("vec_id"), lit("delta").as("segment"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val cand = idx.unionByName(del)
    val live = tombstones.fold(cand)(t =>
      cand.join(t, Seq("vec_id"), "left_anti"))
    live
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("segment"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** LSH serve under an [[AnnGeometry]]: probe the query's bucket in
    * EVERY table (OR-of-ANDs), union the candidates, exact-rescore,
    * top-k. At higher plane counts the extra tables are the recall
    * mechanism (a neighbor split off by one table's hyperplanes is
    * caught by another's), replacing the pinned geometry's Hamming-1
    * multiprobe while scanning ~tables·N/2^planes candidates — the
    * serve-side counterpart of [[qKnnJoinG]]'s candidate generation.
    * Output is (vec_id, score): a candidate may arrive via several
    * tables, so no single bucket column is meaningful. */
  def qAnnLshG(spark: SparkSession, dir: String,
      geo: AnnGeometry = AnnGeometry.Pinned, k: Int = 10): DataFrame = {
    val bt = lshTables(spark, dir, geo)
    val qb = bt.filter(col("vec_id") === 0)
      .select(col("table").as("q_table"), col("bucket").as("q_bucket"))
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    bt.join(broadcast(qb),
        col("table") === col("q_table") && col("bucket") === col("q_bucket"))
      .filter(col("vec_id") =!= 0)
      .select("vec_id").distinct()
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** Registry face of the banded multi-table construction: the
    * 2-table × 4-plane serve, oracle-checked against DuckDB (the
    * oracle recomputes both tables' buckets from the same global
    * hyperplane family and unions the bucket-mates) — the OR-of-ANDs
    * recall mechanism [[AnnGeometry]] scales, pinned at a
    * hash-exact-verifiable geometry. */
  def qAnnLshMt(spark: SparkSession, dir: String): DataFrame =
    qAnnLshG(spark, dir, AnnGeometry(planes = 4, tables = 2, ivfCells = 8))

  /** Multi-probe LSH: probe the query bucket AND its 4 Hamming-1
    * neighbors (flip each hyperplane bit) — the standard recall fix
    * when a near neighbor falls just across one hyperplane. Still
    * scans only ~5/16 of the corpus. */
  def qAnnLshProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buckets = lshBuckets(spark, dir)
    val masks = (0L +: (0 until Planes).map(p => 1L << p)).toDF("mask")
    val probes = buckets.filter(col("vec_id") === 0)
      .crossJoin(broadcast(masks))
      .select(col("bucket").bitwiseXOR(col("mask")).as("bucket"))
      .distinct()
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    buckets.join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= 0)
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("bucket"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** Batch index BUILD: materialize the LSH bucket table and the IVF
    * assignment table to parquet — the north-star split: Spark
    * batch-builds the index; a serving layer (or later Spark jobs)
    * probes it without recomputing signatures. Bucket/cell are the
    * partition columns, so a probe reads one directory. */
  def buildIndexes(spark: SparkSession, dir: String, indexPath: String,
      geo: AnnGeometry = AnnGeometry.Pinned): Unit = {
    val lsh =
      if (geo.tables == 1) lshTables(spark, dir, geo).drop("table")
      else lshTables(spark, dir, geo)
    graft.store.ChunkStore.write(lsh, s"$indexPath/lsh",
      partitionCols = if (geo.tables == 1) Seq("bucket")
        else Seq("table", "bucket"))
    val assign = ivfRankedG(spark, dir, geo.ivfCells)
      .filter(col("rn") === 1)
      .select("vec_id", "cell")
    graft.store.ChunkStore.write(assign, s"$indexPath/ivf",
      partitionCols = Seq("cell"))
  }

  /** Deterministic argmax cell assignment for an embedding slice
    * against a broadcast codebook — the window-free formulation
    * ([[ivfRankedG]]'s rn=1 rows computed as a map-side aggregate):
    * max on (csim, -cell) reproduces the window's
    * (desc csim, asc cell) ordering exactly. */
  private[graft] def cellAssign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("csim",
        round(cosinePrenormed(dot(col("embedding"), col("cv")),
          col("nrm"), col("cn")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("csim"), (-col("cell")).as("negc"))).as("best"))
      .select(col("vec_id"), (-col("best.negc")).as("cell"))

  /** [[cellAssign]] with the winning similarity attached (integer
    * micro) — the assignment-quality reading codebook refinement is
    * judged by (CodebookSpec monotonicity). */
  private[graft] def cellAssignScored(spark: SparkSession, dir: String,
      cents: DataFrame): DataFrame =
    Search.embNormed(spark, dir).crossJoin(broadcast(cents))
      .withColumn("csim",
        round(cosinePrenormed(dot(col("embedding"), col("cv")),
          col("nrm"), col("cn")), 6))
      .groupBy("vec_id")
      .agg(max(struct(col("csim"), (-col("cell")).as("negc"))).as("best"))
      .select(col("vec_id"), (-col("best.negc")).as("cell"),
        round(col("best.csim") * 1000000, 0).cast("long").as("csim_micro"))

  /** Spherical-k-means codebook refinement — [[qKmeansStep]] iterated
    * to a fixed budget, producing the TRAINED coarse quantizer the
    * IVF family can serve against (production's answer to the
    * deterministic first-`cells` bootstrap codebook): each round
    * re-assigns every vector ([[cellAssign]] against the broadcast
    * codebook) and recomputes every centroid as an exact fixed-point
    * component mean. Cosine ignores centroid magnitude, so the
    * un-normalized mean yields the same assignments (and the same
    * rounded similarities) as the normalized spherical-k-means mean —
    * and the total assignment similarity is non-decreasing across
    * iterations (CodebookSpec pins the monotonicity).
    *
    * Scale shape per iteration: assignment = broadcast codebook × one
    * narrow corpus map; recompute = ONE (cell, pos) shuffle with
    * map-side partial sums into cells·dim rows. Only the tiny
    * centroid table (persisted, K·d rows) crosses iterations — the
    * corpus is scanned once per round, never collected.
    *
    * Returns (cell, cv: array<double>, cn) — a drop-in codebook. */
  def refineCodebook(spark: SparkSession, dir: String, iters: Int,
      cells: Int = AnnGeometry.Pinned.ivfCells): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val comps = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "comp")))
      .withColumn("micro",
        round(col("comp").cast("double") * 1000000, 0).cast("long"))
    var cents = e.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cv"),
        col("nrm").cast("double").as("cn"))
    var prev: Option[DataFrame] = None
    for (_ <- 0 until iters) {
      val assign = cellAssign(e, cents.select(col("cell"), col("cv"),
        col("cn")))
      val updated = assign.join(comps, "vec_id")
        .groupBy("cell", "pos")
        .agg(sum("micro").as("s"), count(lit(1)).as("n"))
        .withColumn("m", col("s").cast("double") / col("n") / 1000000.0)
        .groupBy("cell")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m")).as("cv"))
        .withColumn("cn", l2norm(col("cv")))
      // empty-cluster handling: a cell that wins zero vectors this
      // round keeps its previous centroid — otherwise the codebook
      // silently shrinks below `cells` and every probe-share estimate
      // (2/cells) computed from the geometry is wrong
      val next = updated
        .unionByName(cents.select("cell", "cv", "cn")
          .join(updated.select("cell"), Seq("cell"), "left_anti"))
        .persist()
      next.count() // materialize: iterations must not re-derive lineage
      prev.foreach(_.unpersist(false))
      prev = Some(next)
      cents = next
    }
    cents
  }

  /** Build the IVF index against an EXPLICIT codebook table (the
    * [[refineCodebook]] output): assignment via the same deterministic
    * argmax, written cell-partitioned. The trained-quantizer variant
    * of [[buildIndexes]]. */
  def buildIndexWith(spark: SparkSession, dir: String, cents: DataFrame,
      indexPath: String): Unit =
    graft.store.ChunkStore.write(
      cellAssign(Search.embNormed(spark, dir), cents),
      s"$indexPath/ivf", partitionCols = Seq("cell"))

  /** Probe an index built by [[buildIndexWith]]: the query ranks the
    * EXPLICIT codebook's cells (2 probes), reads those partitions,
    * exact-rescores. Mirrors [[probeIvfIndex]] with the trained
    * quantizer in place of the bootstrap codebook. */
  def probeIvfIndexWith(spark: SparkSession, dir: String, cents: DataFrame,
      indexPath: String, k: Int = 10): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val probe = q.crossJoin(broadcast(cents))
      .withColumn("csim",
        round(cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
      .orderBy(desc("csim"), col("cell")).limit(2)
      .select(col("cell"))
    graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
      .join(broadcast(probe), "cell")
      .filter(col("vec_id") =!= 0)
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("cell"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** The sealed-segment cutoff [[qAnnDelta]] serves against: ids below
    * it existed at index-build time. One broadcast aggregate row. */
  private[graft] def deltaCutoff(e: DataFrame): DataFrame =
    e.agg(expr(
      "min(vec_id) + ((max(vec_id) - min(vec_id) + 1) * 9) div 10")
      .as("cutoff"))

  /** Build the PARTIAL IVF index [[qAnnDelta]] presumes: cell
    * assignment for the sealed segment only (ids below the 90%
    * cutoff). The delta stays unindexed until [[resealIndex]]. */
  def buildSealedIndex(spark: SparkSession, dir: String,
      indexPath: String): Unit = {
    val assign = ivfRanked(spark, dir).filter(col("rn") === 1)
      .select("vec_id", "cell")
      .crossJoin(broadcast(deltaCutoff(Search.embNormed(spark, dir))))
      .filter(col("vec_id") < col("cutoff"))
      .select("vec_id", "cell")
    graft.store.ChunkStore.write(assign, s"$indexPath/ivf",
      partitionCols = Seq("cell"))
  }

  /** Serve sealed+delta from the PREBUILT partial index: the indexed
    * side reads only the query's 2 probe cells' directories; vectors
    * absent from the index (the delta — an anti-join, no cutoff
    * scalar needed at serve time) are brute-forced; one merged top-k.
    * Row-identical to the from-scratch [[qAnnDelta]] (AnnSealSpec). */
  def probeIvfDelta(spark: SparkSession, dir: String, indexPath: String,
      k: Int = 10, cells: Int = AnnGeometry.Pinned.ivfCells): DataFrame =
    probeIvfDeltaCore(spark, dir, indexPath, k, cells, tombstones = None)

  /** [[probeIvfDelta]] minus the tombstone table: the candidate set
    * (probed cells ∪ delta) anti-joins the accumulated delete ids
    * BEFORE the top-k — exact results over survivors with zero index
    * rewrite. The tombstone read is absent-safe (no deletes yet ⇒
    * identical to [[probeIvfDelta]]). */
  def probeIvfDeltaLive(spark: SparkSession, dir: String, indexPath: String,
      k: Int = 10, cells: Int = AnnGeometry.Pinned.ivfCells): DataFrame =
    probeIvfDeltaCore(spark, dir, indexPath, k, cells,
      tombstones = Some(readTombstones(spark, indexPath)))

  private def probeIvfDeltaCore(spark: SparkSession, dir: String,
      indexPath: String, k: Int, cells: Int,
      tombstones: Option[DataFrame]): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val c = e.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val probe = q.crossJoin(broadcast(c))
      .withColumn("csim",
        round(cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
      .orderBy(desc("csim"), col("cell")).limit(2)
      .select(col("cell"))
    val assign = graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
    val idx = assign.join(broadcast(probe), "cell")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), lit("indexed").as("segment"))
    val del = e.select("vec_id")
      .join(assign.select("vec_id"), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), lit("delta").as("segment"))
    val cand = idx.unionByName(del)
    val live = tombstones.fold(cand)(t =>
      cand.join(broadcast(t), Seq("vec_id"), "left_anti"))
    live
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("segment"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** Append delete ids to the index's tombstone table. Deletes are an
    * APPEND between compactions (delete-rate-bounded); the physical
    * rewrite happens only at [[resealWithTombstones]]. */
  def writeTombstones(spark: SparkSession, ids: DataFrame,
      indexPath: String): Unit =
    graft.store.ChunkStore.write(ids.select("vec_id"),
      s"$indexPath/tombstones",
      mode = org.apache.spark.sql.SaveMode.Append)

  /** The accumulated tombstone ids; empty frame when no delete has
    * ever been written (serve code is absent-safe). */
  private def readTombstones(spark: SparkSession,
      indexPath: String): DataFrame = {
    val p = new java.io.File(s"$indexPath/tombstones")
    if (p.exists())
      graft.store.ChunkStore.read(spark, p.toString)
        .select("vec_id").distinct()
    else spark.range(0).select(col("id").as("vec_id"))
  }

  /** RE-SEAL compaction — the nightly job the sealed+delta split
    * implies (FAISS/Milvus growing→sealed segment handoff): vectors
    * missing from the index are assigned to cells with the SAME
    * deterministic rule the builder uses, and the union is written as
    * a NEW partitioned index then atomically swapped in (write-new +
    * rename — never overwrite a directory being read). Post-seal,
    * [[probeIvfIndex]] equals the from-scratch [[qAnnIvf]] exactly.
    *
    * Scale shape: the delta anti-join is id-keyed and
    * delta-sized; assignment is one broadcast-codebook map over the
    * delta only (the sealed rows are copied through untouched, a
    * cells-partitioned file copy); nothing rescans the sealed corpus. */
  def resealIndex(spark: SparkSession, dir: String, indexPath: String,
      cells: Int = AnnGeometry.Pinned.ivfCells): Unit = {
    val e = Search.embNormed(spark, dir)
    val assign = graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
      .select("vec_id", "cell")
    val cents = e.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    val delta = e.join(assign.select("vec_id"), Seq("vec_id"), "left_anti")
    val next = assign.unionByName(cellAssign(delta, cents))
    graft.store.ChunkStore.write(next, s"$indexPath/ivf_next",
      partitionCols = Seq("cell"))
    graft.model.Artifacts.swap(spark, s"$indexPath/ivf_next",
      s"$indexPath/ivf")
  }

  /** [[resealIndex]] that also applies the tombstone table to the
    * INDEX: tombstoned rows drop out of the sealed assignment
    * (id-keyed anti-join), the surviving delta is assigned by the
    * builder's deterministic rule, and the new index swaps in
    * atomically. The tombstone table is deliberately KEPT — not
    * truncated: the delta classifier treats index-absence as "new
    * arrival", so as long as the deleted vectors still exist in
    * STORAGE, dropping the tombstones would resurrect them through
    * the delta scan (AnnSealSpec demonstrates exactly this). That is
    * the Lucene/Milvus rule: live-docs outlive segment rewrites until
    * the storage delete lands. Truncate explicitly via
    * [[truncateTombstones]] AFTER [[graft.store.ChunkStore.deleteInto]]
    * has removed the rows from the vector store itself. Codebook
    * centroids come from the UNFILTERED corpus so probe routing
    * matches [[probeIvfIndex]] before and after. */
  def resealWithTombstones(spark: SparkSession, dir: String,
      indexPath: String,
      cells: Int = AnnGeometry.Pinned.ivfCells): Unit = {
    val t = readTombstones(spark, indexPath)
    val e = Search.embNormed(spark, dir)
    val live = e.join(broadcast(t), Seq("vec_id"), "left_anti")
    val assign = graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
      .select("vec_id", "cell")
      .join(broadcast(t), Seq("vec_id"), "left_anti")
    val cents = e.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    val delta = live.join(assign.select("vec_id"), Seq("vec_id"), "left_anti")
    val next = assign.unionByName(cellAssign(delta, cents))
    graft.store.ChunkStore.write(next, s"$indexPath/ivf_next",
      partitionCols = Seq("cell"))
    graft.model.Artifacts.swap(spark, s"$indexPath/ivf_next",
      s"$indexPath/ivf")
  }

  /** Drop the tombstone table — valid ONLY once the tombstoned rows
    * are gone from the vector store itself (deleteInto + reseal), at
    * which point index-absence and storage-absence agree again.
    * Write-new + atomic swap: a racing serve reads either the old
    * table or the empty one, both correct post-storage-delete. */
  def truncateTombstones(spark: SparkSession, indexPath: String): Unit = {
    graft.store.ChunkStore.write(
      spark.range(0).select(col("id").as("vec_id")),
      s"$indexPath/tombstones_next")
    graft.model.Artifacts.swap(spark, s"$indexPath/tombstones_next",
      s"$indexPath/tombstones")
  }

  /** Probe the PREBUILT IVF index: no signature recomputation — read
    * the query's 2 nearest cells' directories, exact-rescore, top-k.
    * Must return exactly what the from-scratch `qAnnIvf` returns. */
  def probeIvfIndex(spark: SparkSession, dir: String, indexPath: String,
      k: Int = 10, cells: Int = AnnGeometry.Pinned.ivfCells): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val c = e.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"), col("nrm").as("cn"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val probe = q.crossJoin(broadcast(c))
      .withColumn("csim",
        round(cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
      .orderBy(desc("csim"), col("cell")).limit(2)
      .select(col("cell"))
    val assign = graft.store.ChunkStore.read(spark, s"$indexPath/ivf")
    assign.join(broadcast(probe), "cell")
      .filter(col("vec_id") =!= 0)
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("cell"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  val SubSpaces = 4
  val SubDim: Int = Dim / SubSpaces
  val PqCentroids = 8

  /** Fixed-point vector components with their PQ subspace index. */
  private def pqComponents(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("se", round(col("x").cast("double") * 1000000, 0).cast("long"))
      .withColumn("sub", floor(col("d") / SubDim).cast("long"))

  /** Product-quantization codes — cached (the PQ "index"): each vector
    * compresses to `SubSpaces` one-byte codes, the nearest (integer
    * squared distance, centroid-id tie-break) of 8 deterministic
    * codebook centroids per 16-dim subspace (subvectors of vec_id < 8,
    * the same no-iteration codebook trick as IVF; production swaps in
    * k-means without changing shape). 64 floats → 4 codes is the 64×
    * compression that keeps a 100 TB corpus's candidate scan in memory;
    * encode is one broadcast join + one (vec, sub, cid)-keyed groupBy,
    * linear in corpus size. Fixed-point distances make codes bit-stable
    * across engines and partitionings. */
  /** The bootstrap PQ codebook in explicit `(sub, cid, d, ce)` form:
    * centroid `cid` of subspace `sub` is vector `cid`'s subvector —
    * the same no-iteration trick as IVF. [[refinePqCodebooks]] emits
    * a drop-in replacement. */
  private[graft] def pqBootstrapCents(sv: DataFrame): DataFrame =
    sv.filter(col("vec_id") < PqCentroids)
      .select(col("sub"), col("vec_id").as("cid"), col("d"),
        col("se").as("ce"))

  /** Per-(vector, subspace) distances to every centroid of an EXPLICIT
    * codebook — `(vec_id, sub, cid, dist)`, exact integer squared
    * distance. Shared by encode, refinement, and the quantization-
    * error audit. */
  private def pqDists(sv: DataFrame, cents: DataFrame): DataFrame =
    sv.join(broadcast(cents), Seq("sub", "d"))
      .groupBy("vec_id", "sub", "cid")
      .agg(sum((col("se") - col("ce")) * (col("se") - col("ce")))
        .as("dist"))

  /** Nearest-centroid assignment (dist asc, cid tie-break) against an
    * explicit codebook — window-free argmax, the same construction as
    * [[cellAssign]]. */
  private[graft] def pqAssign(sv: DataFrame, cents: DataFrame): DataFrame =
    pqDists(sv, cents)
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("dist"), col("cid"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.cid").as("code"))

  def pqCodes(spark: SparkSession, dir: String): DataFrame =
    Cache.getOrBuild(spark, "pqCodes", dir) {
      val sv = pqComponents(spark, dir)
      pqAssign(sv, pqBootstrapCents(sv))
    }

  /** PQ codes over the OPQ-ROTATED components
    * ([[pqComponentsRotated]]) — the trained rotation composed into
    * the encode, so quantization happens in the eigenbasis where the
    * balanced snake allocation provably helps (PqRotateSpec pins the
    * rotated bootstrap error ≤ permutation-only; measured 2.6% lower
    * on this corpus). Same cached-artifact discipline as [[pqCodes]];
    * the bootstrap centroids are the same vec_id < 8 rows, taken in
    * the rotated layout. */
  private[graft] def pqCodesRotated(spark: SparkSession,
      dir: String): DataFrame =
    Cache.getOrBuild(spark, "pqCodesRot", dir) {
      val sv = pqComponentsRotated(spark, dir)
      pqAssign(sv, pqBootstrapCents(sv))
    }

  /** [[pqQueryTable]] in the rotated basis — the ADC lookup the
    * rotated encode serves against; `sub` rides the component rows
    * (the eigen-order snake), not a positional floor. */
  private[graft] def pqQueryTableRotated(spark: SparkSession,
      dir: String): DataFrame =
    Cache.getOrBuild(spark, "pqQueryTableRot", dir) {
      val sv = pqComponentsRotated(spark, dir)
      val cents = sv.filter(col("vec_id") < PqCentroids)
        .select(col("vec_id").as("cid"), col("d"), col("se").as("ce"))
      sv.filter(col("vec_id") === 0)
        .join(broadcast(cents), "d")
        .groupBy("sub", "cid")
        .agg(sum(col("se") * col("ce")).as("dot_fp"))
    }

  /** Per-subspace Lloyd refinement of the PQ codebooks — the k-means
    * swap the bootstrap comment promises, closing the PQ family the
    * way [[refineCodebook]] closed the IVF coarse quantizer: each
    * round re-encodes every subvector against the broadcast codebook
    * and recomputes each (sub, cid) centroid component as the exact
    * rounded-integer mean of its members. Integer centroids keep
    * every distance exact, so assignments (and the error audit) are
    * bit-stable on any partitioning; the k-means objective
    * ([[pqQuantError]]) is non-increasing across rounds
    * (PqRefineSpec pins it).
    *
    * Scale shape per round: one broadcast-codebook distance pass
    * (same plan as encode) + ONE (sub, cid, d) shuffle with map-side
    * partial sums into `SubSpaces · PqCentroids · SubDim` rows — only
    * that tiny codebook table crosses iterations. */
  def refinePqCodebooks(spark: SparkSession, dir: String,
      iters: Int): DataFrame = {
    val sv = pqComponents(spark, dir)
    var cents = pqBootstrapCents(sv)
    var prev: Option[DataFrame] = None
    for (_ <- 0 until iters) {
      val assign = pqAssign(sv, cents)
        .withColumnRenamed("code", "cid")
      val updated = assign.join(sv, Seq("vec_id", "sub"))
        .groupBy("sub", "cid", "d")
        .agg(expr("CAST(round(avg(se)) AS BIGINT)").as("ce"))
      // empty-cluster handling: a (sub, cid) that captured no
      // subvectors this round keeps its previous centroid — without
      // this the codebook silently shrinks below PqCentroids and every
      // later round (and pqServeWith) runs against fewer centroids
      val next = updated
        .unionByName(cents.join(updated.select("sub", "cid").distinct(),
          Seq("sub", "cid"), "left_anti"))
        .persist()
      next.count() // materialize: iterations must not re-derive lineage
      prev.foreach(_.unpersist(false))
      prev = Some(next)
      cents = next
    }
    cents
  }

  /** Total quantization error (Σ per-subvector min squared distance)
    * under an explicit codebook — the k-means objective, exact
    * integer. */
  private[graft] def pqQuantError(sv: DataFrame, cents: DataFrame): Long =
    pqDists(sv, cents)
      .groupBy("vec_id", "sub")
      .agg(min(col("dist")).as("best"))
      .agg(coalesce(sum(col("best")), lit(0L))).head.getLong(0)

  /** ADC lookup table for the query vector: exact fixed-point dot of
    * each query subvector with each centroid — `SubSpaces × 8` rows,
    * broadcast. */
  private def pqQueryTable(spark: SparkSession, dir: String): DataFrame =
    Cache.getOrBuild(spark, "pqQueryTable", dir) {
      val sv = pqComponents(spark, dir)
      val cents = sv.filter(col("vec_id") < PqCentroids)
        .select(col("vec_id").as("cid"), col("d"), col("se").as("ce"))
      sv.filter(col("vec_id") === 0)
        .join(broadcast(cents), "d")
        .groupBy("sub", "cid")
        .agg(sum(col("se") * col("ce")).as("dot_fp"))
    }

  /** ANN via product quantization, the standard two-stage serve path:
    * (1) asymmetric distance computation — a candidate's approximate
    * dot product is the sum of 4 integer table lookups
    * (query-subvector · assigned-centroid), never touching the original
    * floats, so the shortlist scan reads only the 4-byte code rows;
    * (2) exact cosine rescore of the 50-candidate shortlist. At 100 TB
    * stage 1 is the full-corpus pass over ~1/16th the bytes and stage 2
    * touches 50 vectors. Scores are the same rounded cosine as the
    * exact/LSH/IVF paths, so q_ann_recall measures PQ recall directly. */
  def qAnnPq(spark: SparkSession, dir: String): DataFrame =
    pqServeFrom(spark, dir, pqCodes(spark, dir), pqQueryTable(spark, dir))

  /** The ADC-shortlist + exact-rescore serve body, parameterized on
    * the code table and query lookup table so the bootstrap and
    * trained-codebook paths ride the IDENTICAL plan. */
  private def pqServeFrom(spark: SparkSession, dir: String,
      codes: DataFrame, qd: DataFrame, k: Int = 10): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val shortlist = codes
      .join(broadcast(qd),
        codes("sub") === qd("sub") && codes("code") === qd("cid"))
      .groupBy("vec_id")
      .agg(sum(col("dot_fp")).as("s"))
      .filter(col("vec_id") =!= 0)
      .orderBy(desc("s"), col("vec_id"))
      .limit(50)
      .select(col("vec_id"))
    shortlist
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(k)
  }

  /** PQ serve against an EXPLICIT (trained) codebook — encode + query
    * lookup table derived from `cents`, then the shared serve body.
    * The trained-quantizer variant of [[qAnnPq]], mirroring
    * [[probeIvfIndexWith]]. */
  def pqServeWith(spark: SparkSession, dir: String,
      cents: DataFrame, k: Int = 10): DataFrame = {
    val sv = pqComponents(spark, dir)
    val codes = pqAssign(sv, cents)
    val qd = sv.filter(col("vec_id") === 0)
      .join(broadcast(cents), Seq("sub", "d"))
      .groupBy("sub", "cid")
      .agg(sum(col("se") * col("ce")).as("dot_fp"))
    pqServeFrom(spark, dir, codes, qd, k)
  }

  /** Embedding-distribution drift between releases — the vector-side
    * twin of `q_dist_drift`'s token-share report: per ground-truth
    * label, member counts in v1 and the simulated v2 (every 7th
    * vector dropped, every 13th re-added under a new id — the same
    * release pattern the text diffs replay) and the COSINE between
    * the two releases' label centroids. A drop below ~0.99 on any
    * label is the "embedding space moved" alarm a pipeline raises
    * before re-training a quantizer or re-mining negatives.
    *
    * Determinism: centroid components are exact fixed-point integer
    * sums (order-independent on any partitioning); the cosine is one
    * double expression over DECIMAL dot/norm sums (a 10⁹-vector
    * corpus would overflow a long at Σ s_a·s_b), rounded once at the
    * end — the NB fixed-point discipline, so DuckDB reproduces it
    * bit-for-bit via HUGEINT. Scale shape: two narrow component
    * scans, one (label, pos) shuffle each, a labels-sized join. */
  def qEmbDrift(spark: SparkSession, dir: String): DataFrame = {
    val e1 = Tables.embeddings(spark, dir)
    val e2 = e1.filter(col("vec_id") % 7 =!= 0)
      .unionByName(e1.filter(col("vec_id") % 13 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000000L))
    def sums(df: DataFrame, p: String) = df
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("se", round(col("x").cast("double") * 1000000, 0).cast("long"))
      .groupBy("label", "d")
      .agg(expr("CAST(sum(se) AS DECIMAL(38,0))").as(s"s_$p"))
    def counts(df: DataFrame, as: String) = df.groupBy("label")
      .agg(count(lit(1)).as(as))
    sums(e1, "a").join(sums(e2, "b"), Seq("label", "d"))
      .groupBy("label")
      .agg(sum(col("s_a") * col("s_b")).as("dot"),
        sum(col("s_a") * col("s_a")).as("na2"),
        sum(col("s_b") * col("s_b")).as("nb2"))
      .withColumn("centroid_cos",
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) *
            sqrt(col("nb2").cast("double"))), 6))
      .join(counts(e1, "n_v1"), "label")
      .join(counts(e2, "n_v2"), "label")
      .select("label", "n_v1", "n_v2", "centroid_cos")
      .orderBy("label")
  }

  /** Embedding-space label report: per label, member count and
    * centroid tightness = ‖mean vector‖ (≈1 ⇔ members point the same
    * way; ≈0 ⇔ isotropic). Centroids are exact: fixed-point component
    * sums (order-independent), one norm per label at the end. The
    * cluster-quality job a training pipeline runs after embedding. */
  def qLabelStats(spark: SparkSession, dir: String): DataFrame = {
    val sv = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("se", round(col("x").cast("double") * 1000000, 0).cast("long"))
    // ‖mean‖ = √(Σ_d s_d²) / (n·10⁶) — s_d are exact integer component
    // sums, so Σ s_d² is order-independent; one sqrt + two divisions.
    sv.groupBy("label", "d")
      .agg(sum(col("se")).as("s"), count(lit(1)).as("n"))
      .groupBy("label")
      .agg(first(col("n")).as("n_vectors"),
        round(sqrt(sum(col("s") * col("s")).cast("double")) /
          first(col("n")) / 1000000.0, 6).as("centroid_norm"))
      .orderBy("label")
  }

  /** Self-measuring ANN quality: recall@10 of EVERY approximate
    * serving family against the exact brute-force top-10, in one plan
    * (union-tag → hit join → grouped ratio) — the partition methods
    * (lsh / lsh_mt / lsh_probe / ivf), the quantization methods
    * (pq / ivfpq / sq8 / binary), and the trained-graph serve (hnsw,
    * whose arm the oracle replays from the committed golden since a
    * trained hierarchy has no SQL mirror). The engine reports its own
    * approximation quality — at scale you run this on a sampled query
    * set as a data-quality job, and the bake-off table is what decides
    * which family serves which corpus. */
  def qAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    // The per-method top-10s are deterministic 10-row tables — persist
    // them session-scoped (like the indices they probe) so the recall
    // report costs four tiny cached reads, not four full serve paths.
    def top10(key: String)(build: => DataFrame): DataFrame =
      Cache.getOrBuild(spark, s"top10_$key", dir)(build.select(col("vec_id")))
    val exact = top10("exact")(Search.qKnn(spark, dir))
      .withColumn("hit", lit(1L))
    val all =
      top10("lsh")(qAnnLsh(spark, dir)).withColumn("method", lit("lsh"))
        .unionByName(top10("lsh_mt")(qAnnLshMt(spark, dir))
          .withColumn("method", lit("lsh_mt")))
        .unionByName(top10("lsh_probe")(qAnnLshProbe(spark, dir))
          .withColumn("method", lit("lsh_probe")))
        .unionByName(top10("ivf")(qAnnIvf(spark, dir))
          .withColumn("method", lit("ivf")))
        .unionByName(top10("pq")(qAnnPq(spark, dir))
          .withColumn("method", lit("pq")))
        .unionByName(top10("ivfpq")(qAnnIvfPq(spark, dir))
          .withColumn("method", lit("ivfpq")))
        .unionByName(top10("binary")(qAnnBinary(spark, dir))
          .withColumn("method", lit("binary")))
        .unionByName(top10("sq8")(qAnnSq8(spark, dir))
          .withColumn("method", lit("sq8")))
        .unionByName(top10("hnsw")(Hnsw.qHnswSearch(spark, dir))
          .withColumn("method", lit("hnsw")))
    all.join(broadcast(exact), Seq("vec_id"), "left")
      .groupBy("method")
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", round(col("n_hits").cast("double") / 10, 6))
      .orderBy("method")
  }

  /** One Lloyd refinement iteration over the IVF coarse quantizer —
    * the distributed k-means step behind cluster-based curation
    * (SemDeDup-style: cluster, then prune within clusters). Reuses the
    * cached cosine assignment ([[ivfRanked]] rn=1), then recomputes
    * every centroid component as an exact fixed-point mean: components
    * quantized to integer micro-units (float→double widening is exact,
    * round(·) agrees across engines off the .5 knife-edge the quantizer
    * never sits on), summed as longs (order-independent), averaged by
    * one final exact-int division — no float accumulation anywhere.
    *
    * Scale shape: assignment = broadcast of K centroids + a narrow map;
    * recompute = ONE shuffle on (cell, pos) with map-side partial sums
    * — K·d result rows regardless of corpus size. Iterating to
    * convergence is this op in a driver loop, each pass reading the
    * previous pass's K·d-row output as the new broadcast codebook. */
  def qKmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val assign = ivfRanked(spark, dir).filter(col("rn") === 1)
      .select("vec_id", "cell")
    val comps = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "comp")))
      .withColumn("micro",
        round(col("comp").cast("double") * 1000000, 0).cast("long"))
    assign.join(comps, "vec_id")
      .groupBy("cell", "pos")
      .agg(count(lit(1)).as("n_members"), sum("micro").as("sum_micro"))
      .withColumn("avg_micro",
        col("sum_micro").cast("double") / col("n_members"))
      .select(col("cell"), col("pos").cast("long").as("pos"),
        col("n_members"), col("sum_micro"), col("avg_micro"))
      .orderBy("cell", "pos")
  }

  /** Int8 scalar-quantized corpus — cached. Per-dimension min/max over
    * the fixed-point components give a 256-level grid; each component
    * stores as one byte and dequantizes to
    * `mn + (code·span) div 255` (all integer, non-negative operands →
    * truncating division is floor division on every engine). 64 floats
    * → 64 bytes is the 4× compression between raw scan and PQ's 16×;
    * unlike PQ the codes preserve per-dimension structure, so the
    * shortlist scan is a plain integer dot product. Build = one
    * dimension-keyed groupBy (64 result rows, broadcast back) + a
    * narrow map — linear, no corpus shuffle. */
  private[operators] def sq8Dequantized(
      spark: SparkSession, dir: String): DataFrame =
    Cache.getOrBuild(spark, "sq8Deq", dir) {
      val sv = pqComponents(spark, dir).select("vec_id", "d", "se")
      val mm = sv.groupBy("d")
        .agg(min("se").as("mn"), max("se").as("mx"))
      sv.join(broadcast(mm), "d")
        .withColumn("code", when(col("mx") > col("mn"),
          expr("(se - mn) * 255L div (mx - mn)")).otherwise(lit(0L)))
        .withColumn("dq", expr("mn + code * (mx - mn) div 255"))
        .select(col("vec_id"), col("d"), col("dq"))
    }

  /** ANN via int8 scalar quantization (the SQ8 of FAISS/Milvus):
    * asymmetric search — the query keeps exact fixed-point components,
    * candidates use their dequantized bytes, shortlist of 30 by the
    * integer approximate dot, exact cosine rescore to top-10. Same
    * two-stage serve shape as [[qAnnPq]]: the full-corpus pass touches
    * the compressed codes only; the float vectors are read for 30
    * rows. */
  def qAnnSq8(spark: SparkSession, dir: String): DataFrame = {
    val qv = pqComponents(spark, dir).filter(col("vec_id") === 0)
      .select(col("d"), col("se").as("qse"))
    val shortlist = sq8Dequantized(spark, dir)
      .filter(col("vec_id") =!= 0)
      .join(broadcast(qv), "d")
      .groupBy("vec_id")
      .agg(sum(col("qse") * col("dq")).as("adot"))
      .orderBy(desc("adot"), col("vec_id"))
      .limit(30)
      .select("vec_id")
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    shortlist.join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select("vec_id", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** IVF cell-balance report: member count, corpus fraction and skew
    * (count ÷ ideal count) per cell. THE partition-skew diagnostic for
    * the ANN serve path — a cell at skew k makes its probe k× the
    * average scan; at 100 TB this table decides when to re-run
    * [[qKmeansStep]] or split hot cells. One groupBy over the cached
    * assignment (8 result rows). */
  def qIvfBalance(spark: SparkSession, dir: String): DataFrame = {
    val assign = ivfRanked(spark, dir).filter(col("rn") === 1)
      .select("vec_id", "cell")
    val total = assign.agg(count(lit(1)).as("n_total"))
    assign.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"))
      .crossJoin(broadcast(total))
      .withColumn("frac",
        round(col("n_vecs").cast("double") / col("n_total"), 6))
      .withColumn("skew",
        round(col("n_vecs").cast("double") * 8 / col("n_total"), 6))
      .select("cell", "n_vecs", "frac", "skew")
      .orderBy("cell")
  }

  /** Per-cluster survivor budget for [[qClusterCap]]. */
  private[graft] val ClusterCapK = 16

  /** Cluster-capped diversity subsampling — the semantic twin of
    * `q_domain_cap`: cap every IVF cell's contribution to the
    * training mix at [[ClusterCapK]] vectors, keeping each cell's
    * most PROTOTYPICAL members (highest centroid cosine, vec_id
    * tie-break). The curation step after SemDeDup-style dedup: a
    * giant semantic cluster (boilerplate, templated crawl) gets a
    * fixed budget instead of proportional mass, while every small
    * cluster keeps all its members — embedding-space balance the
    * source-keyed cap can't see (Abbas et al. 2023 §5 discuss exactly
    * this cluster-budgeting).
    *
    * Scale shape: rides the CACHED [[ivfRanked]] assignment (no new
    * corpus pass in a warm session), and the per-cell top-K comes
    * from the bounded [[graft.functions.TopKAggregator]] — each
    * partition ships ≤K rows per cell, so a mega-cluster never
    * funnels through one sort task (the row_number-per-cell
    * formulation stays the oracle). */
  def qClusterCap(spark: SparkSession, dir: String): DataFrame = {
    val assign = ivfRanked(spark, dir).filter(col("rn") === 1)
      .select(col("cell"), col("vec_id"),
        round(col("csim") * 1000000, 0).cast("long").as("csim_micro"))
    assign.groupBy("cell")
      .agg(graft.functions.TopKAggregator.topKUdaf(ClusterCapK)(
        col("vec_id"), col("csim_micro").cast("double")).as("top"))
      .select(col("cell"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("cell"), (col("pos") + 1).cast("long").as("rk"),
        col("p._1").as("vec_id"), col("p._2").cast("long").as("csim_micro"))
      .orderBy("cell", "rk")
  }

  /** Cluster-vs-label purity: for every IVF cell, the dominant
    * ground-truth label and its share of the cell — the external
    * cluster-quality check run after [[qKmeansStep]] refinements
    * (purity rising across iterations = the quantizer is learning the
    * label structure). One (cell, label) groupBy over the cached
    * assignment + a cell-keyed argmax window; K·L result rows. */
  def qTopicPurity(spark: SparkSession, dir: String): DataFrame = {
    val assign = ivfRanked(spark, dir).filter(col("rn") === 1)
      .select("vec_id", "cell")
    val labeled = assign.join(
      Tables.embeddings(spark, dir).select("vec_id", "label"), "vec_id")
    val w = Window.partitionBy("cell").orderBy(desc("n"), col("label"))
    labeled.groupBy("cell", "label")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_members", sum("n").over(Window.partitionBy("cell")))
      .filter(col("rk") === 1)
      .select(col("cell"), col("n_members"),
        col("label").as("top_label"), col("n").as("top_n"))
      .withColumn("purity",
        round(col("top_n").cast("double") / col("n_members"), 6))
      .orderBy("cell")
  }

  /** Hard-negative mining for embedding-model training (the
    * contrastive-learning data op: the most-similar vectors that are
    * NOT the query's class are the informative negatives): for each
    * probe vector (vec_id < 8, the family's standing query set), the
    * top-5 cosine-nearest embeddings with a DIFFERENT ground-truth
    * label.
    *
    * Scale shape: queries broadcast, corpus scanned once; the per-query
    * top-5 comes from [[graft.functions.TopKAggregator]] — a bounded
    * map-side buffer, so each partition ships at most 5 rows per query
    * into the shuffle instead of the corpus-sized partition a
    * row_number window would sort (the window formulation stays the
    * oracle; TopKSpec proves equivalence). */
  def qHardNegatives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("embedding").as("qv"), col("nrm").as("qn"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") &&
        col("label") =!= col("qlabel"))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select(col("query_id"), col("vec_id"), col("score"))
      .groupBy("query_id")
      .agg(graft.functions.TopKAggregator.topKUdaf(5)(
        col("vec_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("p._1").as("vec_id"), col("p._2").as("score"))
      .orderBy("query_id", "rank")
  }

  /** Baseline salt factor for the bucket self-joins: splits each
    * bucket's pair space into S disjoint salt slices so a hot bucket's
    * quadratic work runs on S tasks instead of one. [[saltFor]] raises
    * it when a sampled probe measures worse skew. */
  private val KnnJoinSalt = 8L

  private val saltMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String, AnnGeometry), Long]
  Cache.registerSideCache(id =>
    saltMemo.filterInPlace { case ((s, _, _), _) => s != id })

  /** Measured-skew salt factor (r7 verdict item 7): a seeded sampled
    * pass over the bucket table measures the max bucket's share of all
    * rows; a bucket holding share s gets ~nextPow2(s · parallelism)
    * salt slices — enough that even a single mega-bucket's pair space
    * spreads across the cluster's cores — clamped to [KnnJoinSalt, 64].
    * (Share-vs-total, not vs-mean: a corpus where EVERY row lands in
    * one bucket has max = mean yet is maximally task-pinned.) Memoized
    * per (session, dir, geo) so serving paths pay the probe once. The
    * salt changes task granularity ONLY — every pair appears exactly
    * once for any salt value — so registry oracle rows are
    * unaffected. */
  private[graft] def saltFor(spark: SparkSession, dir: String,
      geo: AnnGeometry): Long =
    saltMemo.getOrElseUpdate(
      (System.identityHashCode(spark), dir, geo), {
        val r = lshTables(spark, dir, geo)
          .sample(withReplacement = false, 0.25, seed = 42L)
          .groupBy("table", "bucket").agg(count(lit(1)).as("c"))
          .agg(max(col("c")).as("mx"), sum(col("c")).as("n"))
          .collect()(0)
        if (r.isNullAt(0)) KnnJoinSalt
        else {
          val share = r.getLong(0).toDouble / math.max(1L, r.getLong(1))
          val k = math.ceil(
            share * spark.sparkContext.defaultParallelism).toLong
          val pow2 = if (k <= 1) 1L else java.lang.Long.highestOneBit(k - 1) * 2
          math.min(64L, math.max(KnnJoinSalt, pow2))
        }
      })

  /** All-pairs approximate kNN JOIN — the corpus-wide "top-k similar
    * neighbors for EVERY vector" primitive (semantic-dedup blocking,
    * diversity pruning, graph construction all start here): candidates
    * are LSH-bucket-mates only — Σ n_b² ≈ N²/2^planes, never N² — and
    * under a [[AnnGeometry.forCorpus]] geometry the plane count grows
    * with log2(N), holding per-bucket occupancy (and with it per-vector
    * candidate count) CONSTANT, so candidate volume is linear in N.
    * Collisions from ANY of the geometry's tables count (OR-of-ANDs;
    * duplicates dropped before ranking), which is what keeps recall up
    * at the higher plane counts. Scored exactly, top-k per vector via
    * [[graft.functions.TopKAggregator]].
    *
    * Scale shape: vectors ride WITH their bucket assignment into ONE
    * (table, bucket, salt)-keyed shuffle (payload joined before the
    * self-join, so no second pass over the corpus); the self-join
    * co-locates per bucket; the bounded aggregator ships ≤k rows per
    * query vector per partition. Clustered embeddings make buckets
    * SKEWED (q_ivf_balance is the diagnostic; the 50× probe measured
    * one bucket pinning a single task for ~19 min): the right side
    * carries salt = vec_id mod S, the left side replicates once per
    * salt value, and the shuffle key becomes (table, bucket, salt) —
    * the identical disjoint pair set at S× the parallelism, with S
    * following the MEASURED skew ([[saltFor]]), not a constant. */
  def qKnnJoinG(spark: SparkSession, dir: String,
      geo: AnnGeometry = AnnGeometry.Pinned, k: Int = 3): DataFrame = {
    import spark.implicits._
    val salt = saltFor(spark, dir, geo)
    val be = lshTables(spark, dir, geo)
      .join(Search.embNormed(spark, dir), "vec_id")
    // distinct column names per side (not aliases of one plan): both
    // legs descend from the same cached `be`, and same-name attributes
    // would resolve to one expression and collapse the join condition
    // to `true` — the alias trap documented at [[qMineBitext]].
    val a = be.select(col("vec_id").as("qid"), col("table").as("q_table"),
        col("bucket").as("q_bucket"), col("embedding").as("qv"),
        col("nrm").as("qn"))
      .crossJoin(broadcast(spark.range(salt).withColumnRenamed("id", "tb")))
    val b = be.select(col("vec_id").as("nid"), col("table").as("n_table"),
        col("bucket").as("n_bucket"), col("embedding").as("nv"),
        col("nrm").as("nn"))
      .withColumn("sb", pmod(col("nid"), lit(salt)))
    val scored = a.join(b,
        col("q_table") === col("n_table") &&
          col("q_bucket") === col("n_bucket") &&
          col("tb") === col("sb") && col("qid") =!= col("nid"))
      .withColumn("score",
        round(cosinePrenormed(dot(col("qv"), col("nv")),
          col("qn"), col("nn")), 6))
      .select("qid", "nid", "score")
    // multi-table: a pair colliding in several tables must rank once
    val uniq = if (geo.tables == 1) scored else scored.distinct()
    uniq
      .groupBy(col("qid").as("vec_id"))
      .agg(graft.functions.TopKAggregator.topKUdaf(k)(
        col("nid"), col("score")).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rank"),
        col("p._1").as("neighbor_id"), col("p._2").as("score"))
      .orderBy("vec_id", "rank")
  }

  /** Registry entry — the pinned test geometry ([[AnnGeometry.Pinned]]),
    * oracle rows hash-exact. */
  def qKnnJoin(spark: SparkSession, dir: String): DataFrame =
    qKnnJoinG(spark, dir)

  /** Distinct bucket-mate candidate PAIRS under a geometry — the
    * volume [[ScaleProbe]] measures to show linear growth under
    * [[AnnGeometry.forCorpus]] where the pinned geometry is quadratic.
    * No payload, no scoring: exactly the pair set [[qKnnJoinG]] ranks. */
  def knnCandidatePairs(spark: SparkSession, dir: String,
      geo: AnnGeometry): DataFrame = {
    val bt = lshTables(spark, dir, geo)
    val a = bt.select(col("vec_id").as("qid"), col("table").as("q_table"),
      col("bucket").as("q_bucket"))
    val b = bt.select(col("vec_id").as("nid"), col("table").as("n_table"),
      col("bucket").as("n_bucket"))
    val pairs = a.join(b,
        col("q_table") === col("n_table") &&
          col("q_bucket") === col("n_bucket") && col("qid") =!= col("nid"))
      .select("qid", "nid")
    if (geo.tables == 1) pairs else pairs.distinct()
  }

  /** IVF-PQ — the canonical FAISS serving composition, built from the
    * engine's own cached pieces: the query probes its 2 nearest IVF
    * cells ([[ivfRanked]]), ADC-scores ONLY those cells' members from
    * their 4-byte PQ codes ([[pqCodes]] × the broadcast query lookup
    * table), shortlists 50, exact-rescores the shortlist, top-10.
    * Scan fraction ≈ (2/8 cells) × (codes vs floats ≈ 1/64 bytes) —
    * multiplicative, which is the whole point of the composition. At
    * 100 TB both the assignment and the codes live cell-partitioned
    * ([[buildIndexes]]); a probe reads two partitions of 4-byte codes
    * and exactly 50 full vectors. Since r10 the fine stage encodes in
    * the TRAINED OPQ eigenbasis ([[pqCodesRotated]] — the rotation
    * artifact `q_pq_rotate` publishes, composed into the serve), so
    * the measured quantization-error gain reaches the serving path;
    * the coarse IVF stage is rotation-invariant and stays in the
    * original basis. */
  def qAnnIvfPq(spark: SparkSession, dir: String): DataFrame =
    ivfPqServeWith(spark, dir, pqCodesRotated(spark, dir),
      pqQueryTableRotated(spark, dir))

  /** The permutation-only (unrotated) IVF-PQ serve — kept as the
    * measured CONTRAST the rotation is judged against (PqRotateSpec
    * pins the rotated serve's recall ≥ this one's), same shape. */
  private[graft] def qAnnIvfPqPerm(spark: SparkSession,
      dir: String): DataFrame =
    ivfPqServeWith(spark, dir, pqCodes(spark, dir),
      pqQueryTable(spark, dir))

  /** The IVF-PQ serve body, parameterized on the code table + ADC
    * lookup so the rotated and permutation-only bases ride the
    * IDENTICAL plan (the [[pqServeFrom]] discipline). */
  private def ivfPqServeWith(spark: SparkSession, dir: String,
      codes: DataFrame, qd: DataFrame): DataFrame = {
    val e = Search.embNormed(spark, dir)
    val ranked = ivfRanked(spark, dir)
    val members = ranked.filter(col("rn") === 1)
      .join(broadcast(ranked.filter(col("vec_id") === 0 && col("rn") <= 2)
        .select(col("cell"))), "cell")
      .filter(col("vec_id") =!= 0)
      .select("vec_id")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val shortlist = codes
      .join(members, "vec_id")
      .join(broadcast(qd
        .withColumnRenamed("cid", "code")), Seq("sub", "code"))
      .groupBy("vec_id")
      .agg(sum(col("dot_fp")).as("s"))
      .orderBy(desc("s"), col("vec_id"))
      .limit(50)
      .select(col("vec_id"))
    shortlist
      .join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")), col("nrm"), col("qn")), 6))
      .select(col("vec_id"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** kNN label-agreement audit — Confident-Learning-style label-error
    * mining (Northcutt et al. 2021's signal, computed geometrically):
    * a vector whose nearest neighbors all carry a DIFFERENT label is a
    * likely mislabel. Per ground-truth label: how many vectors, how
    * many of their top-3 neighbors agree, the exact integer agreement
    * fraction, and the suspect count (zero agreeing neighbors) — the
    * per-class noise report that decides which labels need human
    * re-annotation before training.
    *
    * Scale shape: rides [[qKnnJoin]]'s salted bucket-mate join
    * unchanged (the expensive part, already probe-validated at 50×);
    * label attachment is two uniform equi-joins on vector id; the
    * verdict layer is a (vec_id)-keyed aggregate then a labels-sized
    * aggregate. No new corpus-quadratic stage. */
  def qLabelNoise(spark: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(spark, dir).select("vec_id", "label")
    val per = qKnnJoin(spark, dir)
      .join(labels, "vec_id")
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("nlabel")), "neighbor_id")
      .groupBy("vec_id", "label")
      .agg(count(lit(1)).as("n_nbrs"),
        sum(when(col("nlabel") === col("label"), 1L).otherwise(0L))
          .as("n_agree"))
    per.groupBy("label")
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        sum("n_nbrs").cast("long").as("n_neighbors"),
        sum("n_agree").cast("long").as("n_agree"),
        expr("(sum(n_agree) * 1000000) div sum(n_nbrs)")
          .as("agree_frac_micro"),
        sum(when(col("n_agree") === 0, 1L).otherwise(0L)).cast("long")
          .as("n_suspect"))
      .orderBy("label")
  }

  /** Embedding-space outlier audit: the 10 vectors farthest from their
    * assigned IVF centroid (lowest assignment cosine), each with its
    * cell's population and exact summed similarity for context — the
    * corrupt-embedding / out-of-distribution detector an embedding
    * ingest runs before vectors enter the index (a degenerate encoder
    * output lands here first). Sums, not averages: cosines can be
    * negative and floor-vs-truncate integer division would diverge
    * across engines, so the report carries exact integer sums.
    *
    * Scale shape: reads the CACHED cell-keyed assignment (shared with
    * qAnnIvf/q_ivf_balance — no new corpus pass); per-cell stats are a
    * cells-sized aggregate broadcast back; the bottom-10 lowers to
    * TakeOrderedAndProject. */
  def qEmbOutliers(spark: SparkSession, dir: String): DataFrame = {
    val a = ivfRanked(spark, dir).filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"),
        round(col("csim") * 1000000, 0).cast("long").as("csim_micro"))
    val cells = a.groupBy("cell")
      .agg(count(lit(1)).cast("long").as("cell_n"),
        sum("csim_micro").cast("long").as("cell_sum_micro"))
    a.join(broadcast(cells), "cell")
      .select("vec_id", "cell", "csim_micro", "cell_n", "cell_sum_micro")
      .orderBy(col("csim_micro"), col("vec_id"))
      .limit(10)
  }

  /** Neighborhood size for the bitext-mining margin denominator. */
  private val MineK = 4

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    * CCMatrix/LASER parallel-corpus op): for every English document,
    * find the non-English candidate maximizing the RATIO margin
    * `cos(x,y) / ((avgcos_k(x→B) + avgcos_k(y→A)) / 2)` over its
    * cross-lingual neighborhood, then report the top-20 mined pairs
    * corpus-wide. Margin beats raw cosine because hub vectors that
    * are "near everything" get their similarity discounted by their
    * own neighborhood average.
    *
    * Scale shape: candidates are LSH-bucket-mates ACROSS the two
    * language partitions (never all-pairs), through the same salted
    * (bucket, salt) shuffle the 50× probe validated for q_knn_join;
    * both directions' top-k neighborhoods come from ONE candidate
    * set via the bounded [[graft.functions.TopKAggregator]] (≤k rows
    * per vector per partition into each shuffle); the per-query
    * argmax is the same map-side argmax aggregate as q_semdedup; the
    * global top-20 lowers to TakeOrderedAndProject. Exactness: scores
    * are 6-decimal-rounded then lifted to integer micro space, so
    * neighborhood sums and the margin (one integer division, positive
    * operands pinned by the s_micro > 0 guard) are bit-identical on
    * any engine. */
  def qMineBitext(spark: SparkSession, dir: String): DataFrame =
    qMineBitextG(spark, dir)

  /** [[qMineBitext]] under an explicit [[AnnGeometry]]: scale jobs pass
    * [[AnnGeometry.forCorpus]] so cross-language candidate volume stays
    * linear; the salt follows the measured bucket skew ([[saltFor]]). */
  def qMineBitextG(spark: SparkSession, dir: String,
      geo: AnnGeometry = AnnGeometry.Pinned): DataFrame = {
    import spark.implicits._
    val salt = saltFor(spark, dir, geo)
    val langs = Tables.documents(spark, dir)
      .select(col("doc_id").as("vec_id"), col("lang"))
    val be = lshTables(spark, dir, geo)
      .join(Search.embNormed(spark, dir), "vec_id")
      .join(langs, "vec_id")
    // distinct bucket aliases per side: both legs descend from the same
    // `be` plan, so en("bucket") === xx("bucket") would resolve to one
    // attribute and collapse to `true`, silently widening candidates to
    // salt-mates across ALL buckets (Spark logs "trivially true equals")
    val en = be.filter(col("lang") === "en")
      .select(col("vec_id").as("en_id"), col("table").as("e_table"),
        col("bucket").as("e_bucket"),
        col("embedding").as("ev"), col("nrm").as("e_nrm"))
      .crossJoin(broadcast(
        spark.range(salt).withColumnRenamed("id", "tb")))
    val xx = be.filter(col("lang") =!= "en")
      .select(col("vec_id").as("other_id"), col("table").as("x_table"),
        col("bucket").as("x_bucket"),
        col("embedding").as("xv"), col("nrm").as("x_nrm"))
      .withColumn("sb", pmod(col("other_id"), lit(salt)))
    val raw = en.join(xx,
        col("e_table") === col("x_table") &&
          col("e_bucket") === col("x_bucket") && col("tb") === col("sb"))
      .withColumn("s_micro",
        round(round(cosinePrenormed(dot(col("ev"), col("xv")),
          col("e_nrm"), col("x_nrm")), 6) * 1000000, 0).cast("long"))
      .filter(col("s_micro") > 0)
      .select("en_id", "other_id", "s_micro")
    // multi-table: a pair colliding in several tables must count once
    // in both margin neighborhoods
    val cand = if (geo.tables == 1) raw else raw.distinct()
    val fwd = cand.groupBy("en_id")
      .agg(graft.functions.TopKAggregator.topKUdaf(MineK)(
        col("other_id"), col("s_micro").cast("double")).as("ftop"))
    val bwd = cand.groupBy("other_id")
      .agg(graft.functions.TopKAggregator.topKUdaf(MineK)(
        col("en_id"), col("s_micro").cast("double")).as("btop"))
      .select(col("other_id"),
        expr("CAST(aggregate(btop, CAST(0.0 AS DOUBLE), (a, x) -> a + x._2) AS BIGINT)")
          .as("sb_sum"),
        size(col("btop")).cast("long").as("kb"))
    fwd
      .select(col("en_id"),
        expr("CAST(aggregate(ftop, CAST(0.0 AS DOUBLE), (a, x) -> a + x._2) AS BIGINT)")
          .as("sf_sum"),
        size(col("ftop")).cast("long").as("kf"),
        posexplode(col("ftop")).as(Seq("pos", "p")))
      .select(col("en_id"), col("sf_sum"), col("kf"),
        col("p._1").as("other_id"), col("p._2").cast("long").as("s_micro"))
      .join(bwd, "other_id")
      .filter(col("sf_sum") * col("kb") + col("sb_sum") * col("kf") > 0)
      .withColumn("margin_micro",
        expr("(2 * s_micro * kf * kb * 1000000) div (sf_sum * kb + sb_sum * kf)"))
      .groupBy("en_id")
      .agg(max(struct(col("margin_micro"), (-col("other_id")).as("neg_id"),
        col("s_micro"))).as("best"))
      .select(col("en_id"), (-col("best.neg_id")).as("other_id"),
        col("best.s_micro").as("score_micro"),
        col("best.margin_micro").as("margin_micro"))
      .join(langs.withColumnRenamed("vec_id", "other_id"), "other_id")
      .select("en_id", "other_id", "lang", "score_micro", "margin_micro")
      .orderBy(desc("margin_micro"), col("en_id"))
      .limit(20)
  }

  /** One-pass embedding covariance (Gram) statistics — the
    * second-moment table that drives PCA/whitening decisions before a
    * product quantizer (OPQ's rotation estimate starts here; Jégou
    * et al. 2011 §IV motivates balancing per-subspace variance) and
    * the anisotropy diagnostics of Ethayarajh 2019 (contextual
    * embeddings concentrate in a narrow cone — high top-eigenvalue
    * share — which degrades LSH/IVF geometry tuned for isotropy).
    *
    * Emits the full upper triangle (i ≤ j) with exact integer sums:
    * components are fixed-point at 1e3 (headroom analysis on
    * [[graft.functions.GramAggregator]] — per-row pair terms ≤ 1e6,
    * so 64-bit sums survive ~9e12 rows), and the covariance NUMERATOR
    * `n·Σxy − Σx·Σy` (= n²·cov in fixed-point units) stays integer so
    * oracle rows hash-match without any float accumulation-order
    * hazard. Downstream eigen-analysis (a 64×64 driver-side Jacobi on
    * the one bounded matrix this emits) lives in EmbCovSpec — the
    * distributed work here is ONE narrow corpus pass with a constant
    * 2,144-long buffer per partition, no shuffle of vectors at all. */
  def qEmbCov(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sv = Tables.embeddings(spark, dir)
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1000, 0).cast("long")).as("se"))
      .as[Seq[Long]]
    sv.select(graft.functions.GramAggregator.gram(Dim))
      .toDF("n", "s", "pairs")
      .select(col("n"), col("s"), explode(col("pairs")).as("p"))
      .select(col("n"), col("p._1").as("i"), col("p._2").as("j"),
        element_at(col("s"), col("p._1") + 1).as("s_i"),
        element_at(col("s"), col("p._2") + 1).as("s_j"),
        col("p._3").as("s_ij"))
      .withColumn("cov_num",
        col("n") * col("s_ij") - col("s_i") * col("s_j"))
      .select("i", "j", "n", "s_i", "s_j", "s_ij", "cov_num")
      .orderBy("i", "j")
  }

  /** Fixed-point components under an EXPLICIT dim→subspace mapping
    * (64-row broadcast) — the parameterized twin of [[pqComponents]]'
    * contiguous `floor(d / SubDim)` split, letting the encode /
    * refine / error plans run unchanged over a re-allocated dimension
    * layout. */
  private[graft] def pqComponentsMapped(spark: SparkSession, dir: String,
      mapping: DataFrame): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("se", round(col("x").cast("double") * 1000000, 0).cast("long"))
      .join(broadcast(mapping.select(col("d"), col("sub"))), "d")

  /** Variance-balanced PQ dimension allocation — the "structured
    * dimension allocation" half of OPQ (Ge et al. 2014; Jégou et al.
    * 2011 §IV observe PQ degrades when subquantizers see unbalanced
    * energy): rank dims by their EXACT per-dim variance numerator
    * `n·Σx² − (Σx)²` (the diagonal of [[qEmbCov]]'s one-pass Gram
    * table — no new corpus pass) and deal them to the [[SubSpaces]]
    * subspaces in a boustrophedon (snake) over the rank order, so
    * each subspace receives one dim from every high-variance stratum.
    * Unlike full OPQ's learned rotation this is a PERMUTATION — it
    * composes with the existing integer PQ encode unchanged (a
    * rotation would break the fixed-point exactness contract).
    *
    * Everything after the covariance pass operates on the bounded
    * 64-row dim table (one global window over 64 rows), so the
    * allocation itself is free at any corpus size. What the snake
    * GUARANTEES is the tighter per-subspace variance spread (pinned
    * by PqBalanceSpec against the contiguous split); the quantization
    * -error effect is data-dependent — on this near-isotropic
    * synthetic corpus it measures within ±2% of contiguous (the spec
    * reports the ratio), and the payoff case is the anisotropic
    * spectrum real text encoders produce (Ethayarajh 2019), where a
    * contiguous split can hand one subquantizer most of the energy. */
  def qPqBalance(spark: SparkSession, dir: String): DataFrame = {
    val diag = qEmbCov(spark, dir)
      .filter(col("i") === col("j"))
      .select(col("i").as("d"), col("cov_num").as("var_num"))
    diag
      // 64-row dim table: the single-partition window is deliberate
      // and BOUNDED BY CONSTRUCTION (one row per embedding dimension
      // — PlanAuditSpec pins the bound; the WindowExec warning for
      // these audited windows is filtered in GraftSession, since a
      // literal partition key is constant-folded and silences nothing)
      .withColumn("rk",
        row_number().over(Window
          .orderBy(desc("var_num"), col("d"))) - 1)
      .withColumn("blk", floor(col("rk") / SubSpaces).cast("long"))
      .withColumn("sub",
        when(pmod(col("blk"), lit(2)) === 0, pmod(col("rk"), lit(SubSpaces)))
          .otherwise(lit(SubSpaces - 1) - pmod(col("rk"), lit(SubSpaces)))
          .cast("long"))
      .select("d", "var_num", "rk", "sub")
      .orderBy("d")
  }

  /** Fixed-point scale of the trained rotation matrix entries. */
  private[graft] val RotMicro = 1000000L

  /** Train the OPQ ROTATION (Ge et al. 2014's other half, completing
    * what [[qPqBalance]]'s permutation started): one distributed
    * covariance pass ([[qEmbCov]]), then the bounded 64×64 Jacobi
    * eigendecomposition ([[graft.functions.JacobiEigen]]) on the
    * driver — rows of the returned matrix are eigenvectors in
    * eigenvalue-descending order, quantized to micro fixed-point so
    * every downstream product is exact integer arithmetic (the same
    * oracle-portability contract as the PQ encode). Deterministic end
    * to end: exact-integer covariance + canonical eigen order/sign,
    * so the RotateSpec drift check can pin the live training against
    * the committed golden artifact. */
  private[graft] def trainRotationMicro(spark: SparkSession,
      dir: String): Seq[(Long, Long, Long)] = {
    val rows = qEmbCov(spark, dir).collect()
    val n = rows.head.getLong(2).toDouble
    val cov = Array.ofDim[Double](Dim, Dim)
    rows.foreach { r =>
      val v = r.getLong(6).toDouble / (n * n * 1e6)
      cov(r.getInt(0))(r.getInt(1)) = v
      cov(r.getInt(1))(r.getInt(0)) = v
    }
    val (_, vecs) = graft.functions.JacobiEigen.eigenSym(cov)
    for {
      k <- 0 until Dim
      d <- 0 until Dim
    } yield (k.toLong, d.toLong, math.round(vecs(k)(d) * RotMicro))
  }

  /** The trained rotation as a table `(k, d, r_micro)` — the
    * publishable artifact ([[graft.model.Artifacts]] layout: one
    * bounded broadcastable table). Registry entry so the training is
    * itself oracle-checked: the DuckDB side replays the committed
    * golden fixture (generated by GoldenChunks from this exact code;
    * PqRotateSpec re-trains live and asserts zero drift). */
  def qPqRotation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trainRotationMicro(spark, dir)
      .toDF("k", "d", "r_micro")
      .orderBy("k", "d")
  }

  /** OPQ-ROTATED fixed-point components: every vector mapped into the
    * covariance eigenbasis by one broadcast join against the 4096-row
    * rotation table + a (vec_id, k) aggregate — `y_k = Σ_d se_d ·
    * R_micro(k,d)`, exact integers end to end. Because eigen order IS
    * variance order, the balanced subspace allocation over rotated
    * components is the snake over k itself (no second variance pass),
    * emitted as `sub`. One corpus scan, one narrow shuffle keyed by
    * (vec_id, k) with map-side partial sums — linear at any corpus
    * size; the rotation table is training output, broadcast like any
    * other model artifact. */
  def qPqRotate(spark: SparkSession, dir: String): DataFrame = {
    // the rotation rides as a LITERAL 64×64 matrix inside the native
    // codegen'd integer mat-vec ([[graft.functions.MatVecMicro]]) —
    // the explode+join formulation shuffled N·d² intermediate rows
    // (27.6 s at the 10× sweep, second-slowest registry query) and
    // the HOF zip_with formulation paid per-element lambda overhead
    // (13 s); this shape is one narrow corpus scan with two tight
    // primitive loops per row + the final posexplode, no join, no
    // aggregate shuffle beyond the output ordering
    val rows = trainRotationMicro(spark, dir)
      .grouped(Dim).map(_.map(_._3)).toSeq
    val rotLit = typedlit(rows)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000, 0).cast("long")).as("se"))
      .select(col("vec_id"),
        posexplode(call_function("graft_imatvec", col("se"), rotLit))
          .as(Seq("kpos", "y")))
      .select(col("vec_id"), col("kpos").cast("long").as("k"), col("y"))
      .withColumn("blk", floor(col("k") / SubSpaces).cast("long"))
      .withColumn("sub",
        when(pmod(col("blk"), lit(2)) === 0, pmod(col("k"), lit(SubSpaces)))
          .otherwise(lit(SubSpaces - 1) - pmod(col("k"), lit(SubSpaces)))
          .cast("long"))
      .select("vec_id", "k", "y", "sub")
      .orderBy("vec_id", "k")
  }

  /** Rotated components in [[pqComponents]] shape `(vec_id, d, se,
    * sub)` so the UNCHANGED PQ encode / refine / error plans run over
    * the eigenbasis layout — `se` rescaled back to the encode's 1e6
    * fixed-point (y carries 1e3·1e6; one exact integer division). */
  private[graft] def pqComponentsRotated(spark: SparkSession,
      dir: String): DataFrame =
    // session-cached: the rotated encode AND its query table both
    // consume this (and the rotation scan is the heavy stage), so the
    // corpus pass runs once per session, not once per consumer
    Cache.getOrBuild(spark, "rotComponentsSub", dir)(
      qPqRotate(spark, dir)
        .select(col("vec_id"), col("k").as("d"),
          (col("y") - pmod(col("y"), lit(1000L))).divide(lit(1000L))
            .cast("long").as("se"),
          col("sub")))

  /** Truncation grid for [[qTruncRecall]]: prefix lengths in the
    * eigen-ordered rotated basis. */
  private[graft] val TruncDims = Seq(4, 8, 16, 32, 64)

  /** TRUNCATED-DIMENSION retrieval eval — the adaptive-retrieval /
    * matryoshka serving question (Kusupati et al. 2022) answered with
    * the artifacts already trained: the OPQ rotation
    * ([[qPqRotation]]) orders dimensions by variance
    * (eigenvalue-descending), so the first d rotated components are
    * the best d-dim linear summary of every vector — a PREFIX scan
    * reads d/64 of the bytes. For each prefix length the serve is the
    * house two-stage shape (integer-dot shortlist of 50 on the
    * truncated components, exact-cosine rescore, top-10), and the row
    * reports recall@10 against the exact top-10 beside the byte
    * fraction the first pass read — the table that decides how short
    * the first pass can afford to be. dims=64 doubles as a rotation
    * sanity row: an orthonormal rotation preserves the geometry, so
    * full-width recall must be ~1. Scale shape: each arm is one
    * narrow scan of a d/64-pruned column slice + a 50-row rescore —
    * the cheap end of the family's cost spectrum. */
  def qTruncRecall(spark: SparkSession, dir: String): DataFrame = {
    val rotated = Cache.getOrBuild(spark, "rotComponents", dir)(
      pqComponentsRotated(spark, dir).select("vec_id", "d", "se"))
    val qc = rotated.filter(col("vec_id") === 0)
      .select(col("d"), col("se").as("qse"))
    val e = Search.embNormed(spark, dir)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    val arms = TruncDims.map { dims =>
      val short = rotated
        .filter(col("vec_id") =!= 0 && col("d") < dims)
        .join(broadcast(qc), "d")
        .groupBy("vec_id")
        .agg(sum(col("se") * col("qse")).as("adot"))
        .orderBy(desc("adot"), col("vec_id"))
        .limit(50)
        .select("vec_id")
      short.join(e, "vec_id")
        .crossJoin(broadcast(qv))
        .withColumn("score",
          round(cosinePrenormed(dot(col("embedding"), col("qv")),
            col("nrm"), col("qn")), 6))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"), lit(dims.toLong).as("dims"))
    }
    // same session-scoped exact-top-10 the bake-off uses (shared key)
    val exact = Cache.getOrBuild(spark, "top10_exact", dir)(
      Search.qKnn(spark, dir).select(col("vec_id")))
      .withColumn("hit", lit(1L))
    arms.reduce(_ unionByName _)
      .join(broadcast(exact), Seq("vec_id"), "left")
      .groupBy("dims")
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", round(col("n_hits").cast("double") / 10, 6))
      .withColumn("bytes_frac", round(col("dims").cast("double") / 64, 6))
      .orderBy("dims")
  }

  /** 1-bit sign signatures of every vector, packed into two 32-bit
    * halves (`sig_lo` = dims 0-31, `sig_hi` = dims 32-63) — the binary
    * quantization code (sign of each component; Charikar 2002's SimHash
    * applied to the identity basis, the "binary quantization" modern
    * vector stores serve first-pass from). Two longs instead of one so
    * no bit ever lands in a BIGINT sign position; Hamming distance is
    * `bit_count(xor(lo)) + bit_count(xor(hi))` — pure integer, engine
    * -portable. 8 bytes/vector vs 256 for float[64]: a 32× scan shrink
    * before any float is touched. */
  private[graft] def binarySigs(spark: SparkSession, dir: String): DataFrame =
    Cache.getOrBuild(spark, "binarySigs", dir) {
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
        // two-word packing holds exactly 64 sign bits; a wider corpus
        // must fail fast, not silently overflow pow(2, d-32) past 2^31
        .withColumn("bit", when(col("d") >= 64,
            expr("assert_true(d < 64, 'binarySigs: embedding dimension > 64 " +
              "overflows the two-word sign packing')").cast("long"))
          .when(col("x") >= 0, 1L).otherwise(0L))
        .groupBy("vec_id")
        .agg(
          sum(when(col("d") < 32,
            col("bit") * expr("CAST(pow(2, d) AS BIGINT)")).otherwise(0L))
            .as("sig_lo"),
          sum(when(col("d") >= 32,
            col("bit") * expr("CAST(pow(2, d - 32) AS BIGINT)")).otherwise(0L))
            .as("sig_hi"))
    }

  /** BINARY-QUANTIZATION serving — Hamming shortlist over the 8-byte
    * sign signatures ([[binarySigs]]), exact-cosine rescore of the 50
    * survivors, top-10. The third compression point in the family
    * (PQ 4 B ≈ 64×, SQ8 64 B ≈ 4×, binary 8 B = 32×): the coarsest
    * code with the cheapest distance (two XOR+popcount per candidate —
    * SIMD-free integer ops, no lookup table), which is why
    * production stores (Qdrant/Weaviate binary quantization) run it as
    * the first-pass filter when memory is the binding constraint. At
    * 100 TB the signature column is its own 8-byte parquet scan — the
    * full-corpus Hamming pass reads 1/32 of the float bytes, and the
    * exact rescore touches exactly 50 vectors. Shortlist and final
    * ranks are fully tie-broken (hamming asc / score desc, then
    * vec_id) so the oracle replay is hash-exact. */
  def qAnnBinary(spark: SparkSession, dir: String): DataFrame = {
    val sigs = binarySigs(spark, dir)
    val qs = sigs.filter(col("vec_id") === 0)
      .select(col("sig_lo").as("qlo"), col("sig_hi").as("qhi"))
    val shortlist = sigs.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qs))
      .withColumn("hamming",
        expr("bit_count(sig_lo ^ qlo) + bit_count(sig_hi ^ qhi)")
          .cast("long"))
      .orderBy(col("hamming"), col("vec_id"))
      .limit(50)
      .select("vec_id", "hamming")
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    shortlist.join(e, "vec_id")
      .crossJoin(broadcast(q))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select("vec_id", "hamming", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(10)
  }

  /** kNN-GRAPH REFINEMENT — one NN-Descent round (Dong, Moses & Li,
    * WWW 2011) over the LSH-seeded kNN graph, the build step of the
    * graph-ANN family (HNSW/DiskANN start from exactly this K-NN
    * graph; the reference's HNSW option,
    * `/root/reference/src/core/vector-db/adapters/duckdb-adapter.ts:358-412`,
    * is the single-node index built on it). The principle: a
    * neighbor's neighbor is likely a neighbor — so each round scores
    * only candidates that share an adjacent node with the target and
    * re-ranks, converging to the true graph without any all-pairs
    * stage.
    *
    * Scale shape: the base graph is [[qKnnJoinG]]'s salted bucket
    * join; reverse adjacency is capped at k per node via the bounded
    * [[graft.functions.TopKAggregator]] (NN-Descent's ρK reverse
    * sample, made deterministic: score desc, id asc) so a hub vector
    * appearing in thousands of lists still contributes a bounded
    * degree; seed edges come from the capped slot join (see
    * [[knnGraphCandidates]]), ≤ k·[[SeedProviders]] forward and the
    * same capped reverse. Every per-node degree term is a CONSTANT,
    * so the local join emits O(degree²) candidates per node — linear
    * in N per round at any corpus size, the paper's empirical-cost
    * claim. No corpus-keyed window anywhere: every ranking rides the
    * bounded aggregators; KnnGraphSpec measures the recall gain over
    * the base graph against brute force. */
  def qKnnGraph(spark: SparkSession, dir: String): DataFrame =
    Cache.getOrBuild(spark, "knnGraphPinned", dir) {
      qKnnGraphG(spark, dir)
    }

  /** [[qKnnGraph]] under an explicit [[AnnGeometry]] — the probe path:
    * ScaleProbe runs the round at `forCorpus(N)` geometry where the
    * candidate volume stays near-linear, exactly as the base kNN join
    * is probed. */
  def qKnnGraphG(spark: SparkSession, dir: String,
      geo: AnnGeometry = AnnGeometry.Pinned, k: Int = 3): DataFrame =
    rankGraphCandidates(spark, dir,
      knnGraphCandidates(spark, dir, geo, k), k)
      .orderBy("vec_id", "rank")

  /** The ONE ranking tail of the graph family: exact-cosine score each
    * candidate pair, keep every node's top-k via the bounded
    * aggregator → `(vec_id, rank, neighbor_id, score)`. Shared by the
    * registry round and the iterated trainer so tie-breaks can never
    * drift between them. */
  private[graft] def rankGraphCandidates(spark: SparkSession, dir: String,
      cand: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val e = Search.embNormed(spark, dir)
    val qe = e.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      col("nrm").as("qn"))
    val ne = e.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      col("nrm").as("nn"))
    cand.join(qe, "qid").join(ne, "nid")
      .withColumn("score",
        round(cosinePrenormed(dot(col("qv"), col("nv")),
          col("qn"), col("nn")), 6))
      .select("qid", "nid", "score")
      .groupBy(col("qid").as("vec_id"))
      .agg(graft.functions.TopKAggregator.topKUdaf(k)(
        col("nid"), col("score")).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rank"),
        col("p._1").as("neighbor_id"), col("p._2").as("score"))
  }

  /** Capped reverse adjacency of scored edges `(u, v, score)`: per
    * target node, its k best sources (score desc, id asc) — the
    * NN-Descent ρK reverse sample, shared by seed construction and
    * every refinement round. */
  private def cappedReverse(spark: SparkSession, edges: DataFrame,
      k: Int): DataFrame = {
    import spark.implicits._
    edges.select(col("v").as("ru"), col("u").as("rv"), col("score"))
      .groupBy(col("ru").as("u"))
      .agg(graft.functions.TopKAggregator.topKUdaf(k)(
        col("rv"), col("score")).as("top"))
      .select(col("u"), explode(col("top")).as("p"))
      .select(col("u"), col("p._1").as("v"))
  }

  /** All pairs sharing an adjacent node in `adj(u, v)` — the local
    * join at the heart of NN-Descent. Distinct column names per side:
    * the self-join alias trap documented at [[qMineBitext]]. */
  private def localJoinPairs(adj: DataFrame): DataFrame = {
    val a = adj.select(col("u").as("au"), col("v").as("av"))
    val b = adj.select(col("u").as("bu"), col("v").as("bv"))
    a.join(b, col("au") === col("bu") && col("av") =!= col("bv"))
      .select(col("av").as("qid"), col("bv").as("nid"))
  }

  /** The round's candidate edge set `(qid, nid)` — base edges ∪ seed
    * edges ∪ the local join over the seeded adjacency. Exposed so the
    * scale probe can count candidate volume directly (the quantity
    * that must stay near-linear under [[AnnGeometry.forCorpus]]). */
  private[graft] def knnGraphCandidates(spark: SparkSession, dir: String,
      geo: AnnGeometry, k: Int): DataFrame = {
    import spark.implicits._
    val base = qKnnJoinG(spark, dir, geo, k)
      .select(col("vec_id").as("u"), col("neighbor_id").as("v"), col("score"))
    val rev = cappedReverse(spark, base, k)
    // Seeding matters: the paper initializes with a RANDOM graph
    // precisely because a locality-closed seed cannot escape its own
    // neighborhood — an LSH-only base is bucket-CLOSED (every edge
    // AND every neighbor-of-neighbor stays inside one bucket), so a
    // round over it alone provably adds nothing. The random init is a
    // SLOT JOIN, free of any id-layout assumption (a `hash mod N`
    // target id would require contiguous ids — true of the synthetic
    // corpus, false of any real one): every node registers as a
    // provider in one hash slot (capped at SeedProviders per slot,
    // smallest ids win — a hard bound, not an expectation), every
    // node posts k hash-derived requests, and request ⋈ provider on
    // the slot key yields ≤ k·SeedProviders deterministic
    // pseudo-random edges per node. Slot count scales with corpus
    // size (N / SeedProviders / 2), so occupancy is constant at any
    // scale.
    val seeds = seedEdges(spark, dir, k)
    // reverse seed lists capped at k too (no score exists on a seed
    // edge yet, so both bounds order on the id itself)
    val revSeeds = seeds
      .groupBy(col("v").as("u"))
      .agg(graft.functions.MinKPairAggregator.minKUdaf(k)(
        col("u"), col("u")).as("top"))
      .select(col("u"), explode(col("top")).as("p"))
      .select(col("u"), col("p._1").as("v"))
    val adj = base.select("u", "v").union(rev)
      .union(seeds).union(revSeeds).distinct()
    localJoinPairs(adj)
      .union(base.select(col("u").as("qid"), col("v").as("nid")))
      .union(seeds.select(col("u").as("qid"), col("v").as("nid")))
      .distinct()
  }

  /** Deterministic pseudo-random edges, ≤ k per node — the NN-Descent
    * random init's SLOT JOIN (see [[knnGraphCandidates]] for why a
    * slot join and not `hash mod N`), extracted so the HNSW layer
    * build can union a capped random-edge quota into every layer's
    * refined graph: pure kNN layers go CLUSTER-CLOSED on clustered
    * corpora (every top-k edge is an intra-cluster sibling; with
    * near-orthogonal clusters greedy descent then has no gradient
    * between them — ScaleProbe's graph_serve_clustered measured
    * recall capped at 0.40), and the long-range quota is exactly the
    * "small world" half of navigable-small-world graphs. */
  private[graft] def seedEdges(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    import spark.implicits._
    val n = Tables.embeddings(spark, dir).count()
    val slots = math.max(1L, n / (SeedProviders * 2))
    val providers = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("v"))
      .withColumn("slot", pmod(hash60Col(
        concat(col("v").cast("string"), lit(":prov"))), lit(slots)))
      .groupBy("slot")
      .agg(graft.functions.MinKPairAggregator.minKUdaf(SeedProviders)(
        col("v"), col("v")).as("top"))
      .select(col("slot"), explode(col("top")).as("p"))
      .select(col("slot"), col("p._1").as("v"))
    val requests = Tables.embeddings(spark, dir).select(col("vec_id").as("u"))
      .crossJoin(broadcast(spark.range(k).withColumnRenamed("id", "j")))
      .select(col("u"), pmod(hash60Col(
        concat(col("u").cast("string"), lit(":seed:"),
          col("j").cast("string"))), lit(slots)).as("slot"))
      .distinct()
    // forward seeds capped at k per node (keep the k smallest matched
    // providers — a request can match up to SeedProviders each, and an
    // uncapped union would multiply every degree term by SeedProviders,
    // measured as cand/vec 72 → 370 before this cap)
    requests.join(providers, "slot")
      .filter(col("u") =!= col("v"))
      .select("u", "v")
      .groupBy("u")
      .agg(graft.functions.MinKPairAggregator.minKUdaf(k)(
        col("v"), col("v")).as("top"))
      .select(col("u"), explode(col("top")).as("p"))
      .select(col("u"), col("p._1").as("v"))
  }

  /** ITERATED NN-Descent — [[qKnnGraphG]]'s round applied to its own
    * output until the graph stops changing or the round budget runs
    * out (the paper's actual training loop; one round is the
    * registry-pinned step). Monotone by construction: each round's
    * candidate set CONTAINS the current edges, so every node's top-k
    * can only improve — Σ scores is non-decreasing. Convergence is
    * declared on the EDGE SET (an order-independent sum of per-edge
    * hashes, one cheap aggregate per round, the
    * [[graft.operators.Dedup]] min-label-propagation discipline), not
    * the score mass: a swap between equally-truncated-scored neighbors
    * leaves Σ scores unchanged while the graph still moved, and a
    * score-sum check would stop the trainer a round early. The
    * maxRounds budget stays the hard termination bound. Per-round
    * cost stays the bounded local join (degree ≤ 2k after round 1,
    * since the adjacency is then the refined graph ∪ its capped
    * reverse, and
    * seeds are only needed to diversify round 1's bucket-closed
    * base). */
  def refineKnnGraph(spark: SparkSession, dir: String,
      geo: AnnGeometry = AnnGeometry.Pinned, k: Int = 3,
      maxRounds: Int = 4): DataFrame = {
    // XOR-fold of per-edge hashes: order-independent, overflow-free
    // under ANSI (a SUM of 2^63-scale hashes overflows), and edges are
    // distinct rows so the fold is a proper set checksum.
    def edgeChecksum(g: DataFrame): Long = g
      .agg(coalesce(
        expr("bit_xor(xxhash64(vec_id, neighbor_id))"), lit(0L)))
      .head.getLong(0)
    def round1(g: DataFrame): DataFrame = {
      val edges = g.select(col("vec_id").as("u"),
        col("neighbor_id").as("v"), col("score"))
      val adj = edges.select("u", "v")
        .union(cappedReverse(spark, edges, k)).distinct()
      val cand = localJoinPairs(adj)
        .union(edges.select(col("u").as("qid"), col("v").as("nid")))
        .distinct()
      rankGraphCandidates(spark, dir, cand, k)
    }
    // localCheckpoint truncates lineage between rounds — iterating on
    // the raw plan compounds the self-join tree exponentially (the
    // classic iterative-Spark hazard; only the k·N-row graph TABLE
    // should cross rounds, the refineCodebook discipline).
    var g = qKnnGraphG(spark, dir, geo, k).localCheckpoint(true)
    var sum0 = edgeChecksum(g)
    var converged = false
    var r = 1
    while (r < maxRounds && !converged) {
      val next = round1(g).localCheckpoint(true)
      val s1 = edgeChecksum(next)
      converged = s1 == sum0
      sum0 = s1
      g = next
      r += 1
    }
    g.orderBy("vec_id", "rank")
  }

  /** Providers kept per seed slot (hard per-slot cap, smallest ids). */
  private[graft] val SeedProviders = 4

  /** Beam hops / entry node / beam width for [[qGraphSearch]]. */
  private[graft] val GraphSearchHops = 3
  private[graft] val GraphSearchEntry = 1L
  private[graft] val GraphSearchBeam = 8

  /** GRAPH-ANN SERVING — greedy beam search over the refined kNN
    * graph, the search phase of the NSW/HNSW family (Malkov &
    * Yashunin 2016; beam width = their efSearch): start at a fixed
    * entry node, repeatedly expand the current beam's graph neighbors,
    * exact-score the newcomers against the query, keep the best
    * [[GraphSearchBeam]] visited, [[GraphSearchHops]] hops, then
    * report the top-10 of everything visited. Completes the family:
    * [[qKnnGraph]] BUILDS the navigable graph, this serves from it.
    *
    * Scale shape: beam state is BOUNDED BY CONSTRUCTION (≤ beam +
    * beam·2k new ids per hop — tens of rows), so holding it on the
    * coordinator is the legitimate k-bounded-collect pattern (same as
    * the registry's broadcast query/mask sets), not a corpus
    * collect. Each hop's work against the cluster is a point-lookup
    * batch: an `isin(beam)` semi-join into the node-partitioned edge
    * table and one scoring pass over ≤ beam·2k vectors — at 100 TB
    * the graph lives id-partitioned on disk and a hop touches a
    * handful of partitions, which is exactly why the graph family
    * serves in sub-linear time where IVF probes scan whole cells.
    *
    * SCALE CAVEAT (measured, round 9): per-hop cost is bounded, but
    * RECALL is not scale-stable on a single-layer k-NN graph — the
    * graph_serve probe shows this flat serve collapsing to recall@10
    * ≈ 0.03 at 20× corpus regardless of entry node or hop/beam budget
    * (short-range edges cannot cross the corpus). This query remains
    * the registry-pinned single-layer shape; the production scale
    * path is the [[Hnsw]] hierarchy (`q_hnsw_search`), whose sparse
    * upper layers supply the missing long-range hops. */
  def qGraphSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kg = qKnnGraph(spark, dir)
      .select(col("vec_id").as("u"), col("neighbor_id").as("v"))
    val edges = kg.union(kg.select(col("v").as("u"), col("u").as("v")))
      .distinct().persist()
    // finally-release: a mid-hop failure must not leak the persisted
    // edge table into the warm session's storage region (accumulated
    // caches starving execution memory is exactly the failure mode
    // GraftSession's storageFraction setting exists for)
    try
      beamServe(spark, dir, edges, queryId = 0L, entry = GraphSearchEntry)
        .toDF("vec_id", "score")
    finally edges.unpersist(false)
  }

  /** One beam search over a prepared symmetric edge table: expand the
    * beam's neighbors hop by hop, exact-score newcomers against the
    * query vector, keep the best `beamW` visited, return the top-`k`
    * of everything visited (query itself excluded). Factored out of
    * [[qGraphSearch]] so the scale probe can serve MANY queries from
    * MANY entry strategies over one persisted graph; registry
    * semantics (query 0, entry [[GraphSearchEntry]]) are this with the
    * defaults. */
  private[graft] def beamServe(spark: SparkSession, dir: String,
      edges: DataFrame, queryId: Long, entry: Long,
      hops: Int = GraphSearchHops, beamW: Int = GraphSearchBeam,
      k: Int = 10): Seq[(Long, Double)] =
    beamServeFrom(spark, dir, edges, queryId, Seq(entry), hops, beamW, k)

  /** [[beamServe]] from an ENTRY SET — identical algorithm, the beam
    * just starts populated with every entry (the multi-entry descent
    * frontier of the HNSW searcher, or any multi-probe caller).
    * `excludeIds` are tombstoned nodes: they stay NAVIGABLE (removing
    * them from the graph would sever paths the search still needs —
    * the Lucene live-docs / HNSW deleted-node rule) but are filtered
    * from the REPORTED top-k; the set is delete-rate-bounded between
    * compactions, never corpus-bounded. */
  private[graft] def beamServeFrom(spark: SparkSession, dir: String,
      edges: DataFrame, queryId: Long, entries: Seq[Long],
      hops: Int = GraphSearchHops, beamW: Int = GraphSearchBeam,
      k: Int = 10, excludeIds: Set[Long] = Set.empty): Seq[(Long, Double)] = {
    import spark.implicits._
    val e = Search.embNormed(spark, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qv"), col("nrm").as("qn"))
    def scoreOf(ids: Seq[Long]): Map[Long, Double] =
      e.filter(col("vec_id").isin(ids: _*))
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(cosinePrenormed(dot(col("embedding"), col("qv")),
            col("nrm"), col("qn")), 6).as("score"))
        .as[(Long, Double)].collect().toMap
    var visited: Map[Long, Double] = scoreOf(entries.distinct)
    var beam: Seq[Long] = entries.distinct
    var hop = 0
    var done = false
    while (hop < hops && !done) {
      val nbrs = edges.filter(col("u").isin(beam: _*))
        .select("v").distinct().as[Long].collect()
      val fresh = nbrs.filterNot(visited.contains)
      // no fresh nodes ⇒ visited (hence the recomputed beam) is a
      // FIXPOINT: every remaining hop would expand the same beam to
      // the same neighbors — stopping here is output-identical and
      // lets callers pass a generous hop cap for free
      if (fresh.isEmpty) done = true
      else visited = visited ++ scoreOf(fresh.toSeq)
      beam = visited.toSeq.filter(_._1 != queryId)
        .sortBy { case (id, s) => (-s, id) }
        .take(beamW).map(_._1)
      hop += 1
    }
    visited.toSeq
      .filter { case (id, _) => id != queryId && !excludeIds.contains(id) }
      .sortBy { case (id, s) => (-s, id) }
      .take(k)
  }

  /** Corpus-derived beam ENTRY for a query: the member of the query's
    * nearest IVF cell that sits closest to that cell's centroid — the
    * HNSW-family answer to "where does the descent start". A FIXED
    * entry id is a pinned constant that degrades as N grows (the entry
    * drifts arbitrarily far from any given query; hops are bounded, so
    * a far entry directly costs recall — ScaleProbe's graph_serve
    * measures exactly this). Cost: two point lookups on the cached
    * [[ivfRankedG]] table — no new corpus pass. */
  private[graft] def graphEntryFor(spark: SparkSession, dir: String,
      queryId: Long, cells: Int = AnnGeometry.Pinned.ivfCells): Long = {
    val ranked = ivfRankedG(spark, dir, cells)
    val qcell = ranked
      .filter(col("vec_id") === queryId && col("rn") === 1)
      .select("cell").head.getLong(0)
    ranked
      .filter(col("rn") === 1 && col("cell") === qcell &&
        col("vec_id") =!= queryId)
      .orderBy(desc("csim"), col("vec_id"))
      .select("vec_id").head.getLong(0)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_binary"     -> (qAnnBinary _),
    "q_knn_graph"      -> (qKnnGraph _),
    "q_graph_search"   -> (qGraphSearch _),
    "q_pq_balance"     -> (qPqBalance _),
    "q_pq_rotation"    -> (qPqRotation _),
    "q_pq_rotate"      -> (qPqRotate _),
    "q_emb_cov"        -> (qEmbCov _),
    "q_mine_bitext"    -> (qMineBitext _),
    "q_ann_delta"      -> (qAnnDelta _),
    "q_ann_tombstone"  -> (qAnnTombstone _),
    "q_ann_filtered"   -> (qAnnFiltered _),
    "q_label_noise"    -> (qLabelNoise _),
    "q_emb_outliers"   -> (qEmbOutliers _),
    "q_ann_ivfpq"      -> (qAnnIvfPq _),
    "q_knn_join"       -> (qKnnJoin _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_topic_purity"  -> (qTopicPurity _),
    "q_cluster_cap"   -> (qClusterCap _),
    "q_kmeans_step"   -> (qKmeansStep _),
    "q_ann_lsh"       -> (qAnnLsh _),
    "q_ann_lsh_mt"    -> (qAnnLshMt _),
    "q_ann_lsh_probe" -> (qAnnLshProbe _),
    "q_ann_ivf"       -> (qAnnIvf _),
    "q_ann_ivf_batch" -> (qAnnIvfBatch _),
    "q_ann_pq"        -> (qAnnPq _),
    "q_ann_sq8"       -> (qAnnSq8 _),
    "q_ann_recall"    -> (qAnnRecall _),
    "q_trunc_recall"  -> (qTruncRecall _),
    "q_ivf_balance"   -> (qIvfBalance _),
    "q_label_stats"   -> (qLabelStats _),
    "q_emb_drift"     -> (qEmbDrift _),
  )

  /** Shared by Dedup's LSH-candidate oracle. */
  private[operators] val bucketsSql =
    """pw AS (
      |  SELECT p, d,
      |    CASE WHEN ('0x'||substr(md5(p::VARCHAR||':'||d::VARCHAR),1,15))::BIGINT % 2 = 0
      |         THEN 1 ELSE -1 END AS w
      |  FROM (SELECT unnest(range(4)) AS p), (SELECT unnest(range(64)) AS d)),
      |sv AS (
      |  SELECT vec_id, d,
      |    CAST(round(embedding[d+1]::DOUBLE * 1000000, 0) AS BIGINT) AS se
      |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
      |bits AS (
      |  SELECT vec_id, p,
      |    CASE WHEN sum(se * w) >= 0 THEN 1 ELSE 0 END AS bit
      |  FROM sv JOIN pw USING (d) GROUP BY vec_id, p),
      |buckets AS (
      |  SELECT vec_id, sum(bit * CAST(pow(2, p) AS BIGINT))::BIGINT AS bucket
      |  FROM bits GROUP BY vec_id),
      |e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings),
      |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)""".stripMargin

  /** The NN-Descent round as oracle CTEs — expects [[bucketsSql]]'s
    * `buckets`/`e` in scope; yields `kgr(qid, nid, score, rank)`, the
    * refined graph before the rank cut. Shared by the q_knn_graph and
    * q_graph_search oracles. */
  private[operators] val knnGraphSql =
    """be AS (
      |  SELECT b.vec_id, b.bucket, e.v, e.nrm
      |  FROM buckets b JOIN e USING (vec_id)),
      |cand0 AS (
      |  SELECT a.vec_id AS qid, b.vec_id AS nid,
      |    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
      |  FROM be a JOIN be b
      |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      |r0 AS (
      |  SELECT qid, nid, score, row_number() OVER (
      |      PARTITION BY qid ORDER BY score DESC, nid) AS rank
      |  FROM cand0),
      |base AS (SELECT qid, nid, score FROM r0 WHERE rank <= 3),
      |rv AS (
      |  SELECT u, v FROM (
      |    SELECT nid AS u, qid AS v,
      |      row_number() OVER (PARTITION BY nid ORDER BY score DESC, qid) AS rr
      |    FROM base) t WHERE rr <= 3),
      |nn AS (SELECT count(*) AS n FROM embeddings),
      |sl AS (SELECT greatest(1, (SELECT n FROM nn) // 8) AS s),
      |prov0 AS (
      |  SELECT vec_id AS v,
      |    ('0x'||substr(md5(vec_id::VARCHAR||':prov'),1,15))::BIGINT
      |      % (SELECT s FROM sl) AS slot
      |  FROM embeddings),
      |prov AS (
      |  SELECT slot, v FROM (
      |    SELECT slot, v, row_number() OVER (PARTITION BY slot ORDER BY v) AS rr
      |    FROM prov0) t WHERE rr <= 4),
      |req AS (
      |  SELECT DISTINCT vec_id AS u,
      |    ('0x'||substr(md5(vec_id::VARCHAR||':seed:'||j::VARCHAR),1,15))::BIGINT
      |      % (SELECT s FROM sl) AS slot
      |  FROM embeddings, (SELECT unnest(range(3)) AS j) s),
      |seeds0 AS (
      |  SELECT u, v FROM req JOIN prov USING (slot) WHERE u <> v),
      |seeds AS (
      |  SELECT u, v FROM (
      |    SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) AS rr
      |    FROM seeds0) t WHERE rr <= 3),
      |rvs AS (
      |  SELECT u, v FROM (
      |    SELECT s.v AS u, s.u AS v,
      |      row_number() OVER (PARTITION BY s.v ORDER BY s.u) AS rr
      |    FROM seeds s) t WHERE rr <= 3),
      |adj AS (
      |  SELECT qid AS u, nid AS v FROM base
      |  UNION SELECT u, v FROM rv
      |  UNION SELECT u, v FROM seeds
      |  UNION SELECT u, v FROM rvs),
      |cand AS (
      |  SELECT a.v AS qid, b.v AS nid
      |  FROM adj a JOIN adj b ON a.u = b.u AND a.v <> b.v
      |  UNION SELECT qid, nid FROM base
      |  UNION SELECT u, v FROM seeds),
      |sc0 AS (
      |  SELECT c.qid, c.nid,
      |    round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) AS score
      |  FROM cand c
      |  JOIN e ea ON ea.vec_id = c.qid
      |  JOIN e eb ON eb.vec_id = c.nid),
      |kgr AS (
      |  SELECT qid, nid, score, row_number() OVER (
      |      PARTITION BY qid ORDER BY score DESC, nid) AS rank
      |  FROM sc0)""".stripMargin

  /** q_graph_search oracle: the refined graph's symmetric adjacency,
    * then [[GraphSearchHops]] beam hops unrolled as CTEs (entry node
    * [[GraphSearchEntry]], beam width [[GraphSearchBeam]]), final
    * top-10 of everything visited. */
  private def graphSearchSql: String = {
    val hops = (1 to GraphSearchHops).map { h =>
      s"""n$h AS (
         |  SELECT DISTINCT g.v AS vec_id
         |  FROM gedges g JOIN b${h - 1} b ON g.u = b.vec_id),
         |v$h AS (
         |  SELECT vec_id FROM v${h - 1} UNION SELECT vec_id FROM n$h),
         |b$h AS (
         |  SELECT s.vec_id FROM scq s JOIN v$h USING (vec_id)
         |  WHERE s.vec_id <> 0
         |  ORDER BY s.score DESC, s.vec_id LIMIT $GraphSearchBeam)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $bucketsSql,
       |$knnGraphSql,
       |kg AS (SELECT qid, nid FROM kgr WHERE rank <= 3),
       |gedges AS (
       |  SELECT qid AS u, nid AS v FROM kg
       |  UNION SELECT nid AS u, qid AS v FROM kg),
       |scq AS (
       |  SELECT e.vec_id,
       |    round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
       |  FROM e, q),
       |b0 AS (SELECT ${GraphSearchEntry}::BIGINT AS vec_id),
       |v0 AS (SELECT vec_id FROM b0),
       |$hops
       |SELECT s.vec_id, s.score
       |FROM scq s JOIN v$GraphSearchHops USING (vec_id)
       |WHERE s.vec_id <> 0
       |ORDER BY s.score DESC, s.vec_id LIMIT 10""".stripMargin
  }

  /** PQ oracle CTEs — expects `sv(vec_id, d, se)` (from [[bucketsSql]])
    * in scope; yields `pqadc(vec_id, s)` with the fixed-point ADC dot. */
  private val pqSql =
    """pqc AS (
      |  SELECT vec_id AS cid, d, se AS ce FROM sv WHERE vec_id < 8),
      |pqdist AS (
      |  SELECT s.vec_id, CAST(floor(s.d / 16) AS BIGINT) AS sub, c.cid,
      |    sum((s.se - c.ce) * (s.se - c.ce)) AS dist
      |  FROM sv s JOIN pqc c USING (d) GROUP BY 1, 2, 3),
      |pqcodes AS (
      |  SELECT vec_id, sub, cid AS code FROM (
      |    SELECT vec_id, sub, cid,
      |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
      |    FROM pqdist) WHERE rn = 1),
      |pqqd AS (
      |  SELECT CAST(floor(s.d / 16) AS BIGINT) AS sub, c.cid,
      |    sum(s.se * c.ce) AS dot_fp
      |  FROM sv s JOIN pqc c USING (d) WHERE s.vec_id = 0 GROUP BY 1, 2),
      |pqadc AS (
      |  SELECT k.vec_id, sum(t.dot_fp)::BIGINT AS s
      |  FROM pqcodes k JOIN pqqd t ON t.sub = k.sub AND t.cid = k.code
      |  GROUP BY 1),
      |pqshort AS (
      |  SELECT a.vec_id FROM pqadc a WHERE a.vec_id <> 0
      |  ORDER BY a.s DESC, a.vec_id LIMIT 50),
      |pqtop AS (
      |  SELECT sh.vec_id,
      |    round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
      |  FROM pqshort sh JOIN e ON e.vec_id = sh.vec_id, q
      |  ORDER BY score DESC, sh.vec_id LIMIT 10)""".stripMargin

  /** The ROTATED PQ encode as oracle CTEs — replays the committed
    * rotation artifact (the q_pq_rotate oracle's construction) into
    * [[pqSql]]'s shapes: yields `rc` (rotated components at encode
    * scale with the eigen-order snake `sub`), `rpqcodes`, `rpqqd` —
    * the fine stage [[qAnnIvfPq]] serves from. */
  private val pqRotSql =
    s"""rrot AS (
      |  SELECT k, d, r_micro FROM
      |  read_parquet('$fixturesDir/pq_rotation_sf0.01.parquet/*.parquet')),
      |rsv3 AS (
      |  SELECT vec_id, d,
      |    CAST(round(embedding[d+1]::DOUBLE * 1000, 0) AS BIGINT) AS se
      |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
      |ry AS (
      |  SELECT vec_id, k, sum(se * r_micro)::BIGINT AS y
      |  FROM rsv3 JOIN rrot USING (d) GROUP BY 1, 2),
      |rc AS (
      |  SELECT vec_id, k AS d,
      |    (y - ((y % 1000) + 1000) % 1000) // 1000 AS se,
      |    CASE WHEN (k // $SubSpaces) % 2 = 0 THEN k % $SubSpaces
      |         ELSE ${SubSpaces - 1} - k % $SubSpaces END AS sub
      |  FROM ry),
      |rpqc AS (
      |  SELECT vec_id AS cid, d, se AS ce FROM rc WHERE vec_id < 8),
      |rpqdist AS (
      |  SELECT s.vec_id, s.sub, c.cid,
      |    sum((s.se - c.ce) * (s.se - c.ce)) AS dist
      |  FROM rc s JOIN rpqc c USING (d) GROUP BY 1, 2, 3),
      |rpqcodes AS (
      |  SELECT vec_id, sub, cid AS code FROM (
      |    SELECT vec_id, sub, cid,
      |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
      |    FROM rpqdist) WHERE rn = 1),
      |rpqqd AS (
      |  SELECT s.sub, c.cid, sum(s.se * c.ce) AS dot_fp
      |  FROM rc s JOIN rpqc c USING (d) WHERE s.vec_id = 0
      |  GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ann_binary" ->
      """WITH bits AS (
        |  SELECT vec_id, d,
        |    CASE WHEN embedding[d+1] >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |sigs AS (
        |  SELECT vec_id,
        |    sum(CASE WHEN d < 32 THEN bit * CAST(pow(2, d) AS BIGINT)
        |        ELSE 0 END)::BIGINT AS sig_lo,
        |    sum(CASE WHEN d >= 32 THEN bit * CAST(pow(2, d - 32) AS BIGINT)
        |        ELSE 0 END)::BIGINT AS sig_hi
        |  FROM bits GROUP BY vec_id),
        |qs AS (SELECT sig_lo AS qlo, sig_hi AS qhi FROM sigs WHERE vec_id = 0),
        |short AS (
        |  SELECT s.vec_id,
        |    (bit_count(xor(s.sig_lo, qlo)) + bit_count(xor(s.sig_hi, qhi)))::BIGINT AS hamming
        |  FROM sigs s, qs WHERE s.vec_id <> 0
        |  ORDER BY hamming, s.vec_id LIMIT 50),
        |e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)
        |SELECT e.vec_id, short.hamming,
        |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |FROM e JOIN short USING (vec_id), q
        |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,
    "q_knn_graph" ->
      s"""WITH $bucketsSql,
         |$knnGraphSql
         |SELECT qid AS vec_id, rank, nid AS neighbor_id, score
         |FROM kgr WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,
    "q_graph_search" -> graphSearchSql,
    // The trained rotation is a Jacobi eigendecomposition — not SQL-
    // expressible, so its oracle is the committed golden artifact
    // (GoldenChunks pattern; PqRotateSpec re-trains live and pins zero
    // drift). The rotated-components oracle REPLAYS the rotation from
    // that artifact over the corpus in exact integer arithmetic.
    "q_pq_rotation" ->
      s"""SELECT k, d, r_micro FROM
         |read_parquet('$fixturesDir/pq_rotation_sf0.01.parquet/*.parquet')
         |ORDER BY k, d""".stripMargin,
    "q_pq_rotate" ->
      s"""WITH r AS (
        |  SELECT k, d, r_micro FROM
        |  read_parquet('$fixturesDir/pq_rotation_sf0.01.parquet/*.parquet')),
        |sv AS (
        |  SELECT vec_id, d,
        |    CAST(round(embedding[d+1]::DOUBLE * 1000, 0) AS BIGINT) AS se
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |y AS (
        |  SELECT vec_id, k, sum(se * r_micro)::BIGINT AS y
        |  FROM sv JOIN r USING (d) GROUP BY 1, 2)
        |SELECT vec_id, k, y,
        |  CASE WHEN (k // $SubSpaces) % 2 = 0 THEN k % $SubSpaces
        |       ELSE ${SubSpaces - 1} - k % $SubSpaces END AS sub
        |FROM y ORDER BY vec_id, k""".stripMargin,
    "q_trunc_recall" ->
      s"""WITH r AS (
        |  SELECT k, d, r_micro FROM
        |  read_parquet('$fixturesDir/pq_rotation_sf0.01.parquet/*.parquet')),
        |sv3 AS (
        |  SELECT vec_id, d,
        |    CAST(round(embedding[d+1]::DOUBLE * 1000, 0) AS BIGINT) AS se
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |y AS (
        |  SELECT vec_id, k, sum(se * r_micro)::BIGINT AS y
        |  FROM sv3 JOIN r USING (d) GROUP BY 1, 2),
        |rc AS (
        |  SELECT vec_id, k AS d,
        |    (y - ((y % 1000) + 1000) % 1000) // 1000 AS se
        |  FROM y),
        |e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0),
        |dims(dims) AS (VALUES (4), (8), (16), (32), (64)),
        |qc AS (SELECT d, se AS qse FROM rc WHERE vec_id = 0),
        |adots AS (
        |  SELECT dims, c.vec_id, sum(c.se * qse)::BIGINT AS adot
        |  FROM rc c JOIN qc USING (d) CROSS JOIN dims
        |  WHERE c.vec_id <> 0 AND c.d < dims
        |  GROUP BY dims, c.vec_id),
        |short AS (
        |  SELECT dims, vec_id FROM (
        |    SELECT dims, vec_id,
        |      row_number() OVER (PARTITION BY dims
        |        ORDER BY adot DESC, vec_id) AS rn
        |    FROM adots) WHERE rn <= 50),
        |resc AS (
        |  SELECT dims, s.vec_id,
        |    round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |  FROM short s JOIN e ON e.vec_id = s.vec_id, q),
        |top AS (
        |  SELECT dims, vec_id FROM (
        |    SELECT dims, vec_id,
        |      row_number() OVER (PARTITION BY dims
        |        ORDER BY score DESC, vec_id) AS rn
        |    FROM resc) WHERE rn <= 10),
        |exact10 AS (
        |  SELECT e.vec_id, 1::BIGINT AS hit FROM e, q WHERE e.vec_id <> 0
        |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
        |    e.vec_id LIMIT 10)
        |SELECT dims::BIGINT AS dims, count(*) AS n_returned,
        |  sum(coalesce(hit, 0))::BIGINT AS n_hits,
        |  round(sum(coalesce(hit, 0))::DOUBLE / 10, 6) AS recall,
        |  round(dims::DOUBLE / 64, 6) AS bytes_frac
        |FROM top LEFT JOIN exact10 USING (vec_id)
        |GROUP BY dims ORDER BY dims""".stripMargin,
    "q_pq_balance" ->
      s"""WITH x AS (
        |  SELECT vec_id, d,
        |    CAST(round(embedding[d+1]::DOUBLE * 1000, 0) AS BIGINT) AS se
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |nn AS (SELECT count(*) AS n FROM embeddings),
        |s AS (SELECT d, sum(se)::BIGINT AS sd, sum(se*se)::BIGINT AS sdd
        |      FROM x GROUP BY d),
        |v AS (SELECT d, nn.n * sdd - sd * sd AS var_num FROM s CROSS JOIN nn),
        |r AS (SELECT d, var_num,
        |    row_number() OVER (ORDER BY var_num DESC, d) - 1 AS rk FROM v)
        |SELECT d, var_num, rk,
        |  CASE WHEN (rk // $SubSpaces) % 2 = 0 THEN rk % $SubSpaces
        |       ELSE ${SubSpaces - 1} - rk % $SubSpaces END AS sub
        |FROM r ORDER BY d""".stripMargin,
    "q_emb_cov" ->
      """WITH x AS (
        |  SELECT vec_id, d,
        |    CAST(round(embedding[d+1]::DOUBLE * 1000, 0) AS BIGINT) AS se
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |nn AS (SELECT count(*) AS n FROM embeddings),
        |s AS (SELECT d, sum(se)::BIGINT AS sd FROM x GROUP BY d),
        |p AS (
        |  SELECT a.d AS i, b.d AS j, sum(a.se * b.se)::BIGINT AS s_ij
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.d <= b.d
        |  GROUP BY 1, 2)
        |SELECT p.i, p.j, nn.n, si.sd AS s_i, sj.sd AS s_j, p.s_ij,
        |  nn.n * p.s_ij - si.sd * sj.sd AS cov_num
        |FROM p CROSS JOIN nn
        |JOIN s si ON si.d = p.i
        |JOIN s sj ON sj.d = p.j
        |ORDER BY i, j""".stripMargin,
    "q_mine_bitext" ->
      s"""WITH $bucketsSql,
         |langs AS (SELECT doc_id AS vec_id, lang FROM documents),
         |be AS (
         |  SELECT b.vec_id, b.bucket, e.v, e.nrm, l.lang
         |  FROM buckets b JOIN e USING (vec_id) JOIN langs l USING (vec_id)),
         |cand AS (
         |  SELECT a.vec_id AS en_id, b.vec_id AS other_id,
         |    CAST(round(round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
         |      * 1000000, 0) AS BIGINT) AS s_micro
         |  FROM be a JOIN be b ON a.bucket = b.bucket
         |  WHERE a.lang = 'en' AND b.lang <> 'en'),
         |pos AS (SELECT * FROM cand WHERE s_micro > 0),
         |f AS (
         |  SELECT en_id, other_id, s_micro, row_number() OVER (
         |      PARTITION BY en_id ORDER BY s_micro DESC, other_id) AS rk
         |  FROM pos),
         |ftop AS (SELECT * FROM f WHERE rk <= $MineK),
         |fstat AS (
         |  SELECT en_id, sum(s_micro)::BIGINT AS sf_sum, count(*)::BIGINT AS kf
         |  FROM ftop GROUP BY 1),
         |bk AS (
         |  SELECT other_id, s_micro, row_number() OVER (
         |      PARTITION BY other_id ORDER BY s_micro DESC, en_id) AS rk
         |  FROM pos),
         |bstat AS (
         |  SELECT other_id, sum(s_micro)::BIGINT AS sb_sum, count(*)::BIGINT AS kb
         |  FROM bk WHERE rk <= $MineK GROUP BY 1),
         |m AS (
         |  SELECT t.en_id, t.other_id, t.s_micro,
         |    (2 * t.s_micro * f.kf * b.kb * 1000000)
         |      // (f.sf_sum * b.kb + b.sb_sum * f.kf) AS margin_micro
         |  FROM ftop t JOIN fstat f USING (en_id) JOIN bstat b USING (other_id)
         |  WHERE f.sf_sum * b.kb + b.sb_sum * f.kf > 0),
         |best AS (
         |  SELECT en_id, other_id, s_micro AS score_micro, margin_micro,
         |    row_number() OVER (
         |      PARTITION BY en_id ORDER BY margin_micro DESC, other_id) AS brk
         |  FROM m)
         |SELECT b.en_id, b.other_id, l.lang, b.score_micro, b.margin_micro
         |FROM best b JOIN langs l ON l.vec_id = b.other_id
         |WHERE b.brk = 1
         |ORDER BY b.margin_micro DESC, b.en_id LIMIT 20""".stripMargin,
    "q_ann_ivfpq" ->
      s"""WITH $bucketsSql,
         |$pqRotSql,
         |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
         |iscored AS (
         |  SELECT e.vec_id, c.cell,
         |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
         |  FROM e, c),
         |iranked AS (
         |  SELECT vec_id, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |  FROM iscored),
         |members AS (
         |  SELECT a.vec_id FROM iranked a
         |  JOIN (SELECT cell FROM iranked WHERE vec_id = 0 AND rn <= 2) p
         |    USING (cell)
         |  WHERE a.rn = 1 AND a.vec_id <> 0),
         |adc AS (
         |  SELECT k.vec_id, sum(t.dot_fp)::BIGINT AS s
         |  FROM rpqcodes k
         |  JOIN members m ON m.vec_id = k.vec_id
         |  JOIN rpqqd t ON t.sub = k.sub AND t.cid = k.code
         |  GROUP BY 1),
         |short AS (
         |  SELECT vec_id FROM adc ORDER BY s DESC, vec_id LIMIT 50)
         |SELECT sh.vec_id,
         |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
         |FROM short sh JOIN e ON e.vec_id = sh.vec_id, q
         |ORDER BY score DESC, sh.vec_id LIMIT 10""".stripMargin,
    "q_knn_join" ->
      s"""WITH $bucketsSql,
         |be AS (
         |  SELECT b.vec_id, b.bucket, e.v, e.nrm
         |  FROM buckets b JOIN e USING (vec_id)),
         |cand AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
         |  FROM be a JOIN be b
         |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT qid, nid, score, row_number() OVER (
         |      PARTITION BY qid ORDER BY score DESC, nid) AS rank
         |  FROM cand)
         |SELECT qid AS vec_id, rank, nid AS neighbor_id, score
         |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,
    "q_label_noise" ->
      s"""WITH $bucketsSql,
         |be AS (
         |  SELECT b.vec_id, b.bucket, e.v, e.nrm
         |  FROM buckets b JOIN e USING (vec_id)),
         |cand AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS score
         |  FROM be a JOIN be b
         |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT qid, nid, score, row_number() OVER (
         |      PARTITION BY qid ORDER BY score DESC, nid) AS rank
         |  FROM cand),
         |knn AS (SELECT qid, nid FROM r WHERE rank <= 3),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |per AS (
         |  SELECT k.qid, ql.label, count(*) AS n_nbrs,
         |    sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS n_agree
         |  FROM knn k
         |  JOIN lab ql ON ql.vec_id = k.qid
         |  JOIN lab nl ON nl.vec_id = k.nid
         |  GROUP BY k.qid, ql.label)
         |SELECT label, count(*)::BIGINT AS n_vecs,
         |  sum(n_nbrs)::BIGINT AS n_neighbors,
         |  sum(n_agree)::BIGINT AS n_agree,
         |  (sum(n_agree)::BIGINT * 1000000) // sum(n_nbrs)::BIGINT
         |    AS agree_frac_micro,
         |  sum(CASE WHEN n_agree = 0 THEN 1 ELSE 0 END)::BIGINT AS n_suspect
         |FROM per GROUP BY label ORDER BY label""".stripMargin,
    "q_emb_outliers" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell, csim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |a AS (
        |  SELECT vec_id, cell,
        |    CAST(round(csim * 1000000, 0) AS BIGINT) AS csim_micro
        |  FROM ranked WHERE rn = 1),
        |cells AS (
        |  SELECT cell, count(*)::BIGINT AS cell_n,
        |    sum(csim_micro)::BIGINT AS cell_sum_micro
        |  FROM a GROUP BY cell)
        |SELECT a.vec_id, a.cell, a.csim_micro, c.cell_n, c.cell_sum_micro
        |FROM a JOIN cells c USING (cell)
        |ORDER BY a.csim_micro, a.vec_id LIMIT 10""".stripMargin,
    "q_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
        |      FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |  FROM e, q
        |  WHERE e.vec_id <> q.query_id AND e.label <> q.qlabel),
        |ranked AS (
        |  SELECT query_id, vec_id, score, row_number() OVER (
        |      PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, score FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_kmeans_step" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        |m AS (
        |  SELECT a.cell, p.pos, round(e.v[p.pos + 1] * 1000000)::BIGINT AS micro
        |  FROM assign a JOIN e USING (vec_id),
        |    LATERAL (SELECT unnest(range(len(e.v))) AS pos) p)
        |SELECT cell, pos, count(*) AS n_members, sum(micro)::BIGINT AS sum_micro,
        |  (sum(micro)::BIGINT)::DOUBLE / count(*) AS avg_micro
        |FROM m GROUP BY cell, pos ORDER BY cell, pos""".stripMargin,
    "q_ann_pq" ->
      s"""WITH $bucketsSql,
         |$pqSql
         |SELECT vec_id, score FROM pqtop
         |ORDER BY score DESC, vec_id""".stripMargin,
    "q_emb_drift" ->
      """WITH sv AS (
        |  SELECT vec_id, label, d,
        |    CAST(round(embedding[d+1]::DOUBLE * 1000000, 0) AS BIGINT) AS se
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |s2 AS (
        |  SELECT vec_id, label, d, se FROM sv WHERE vec_id % 7 <> 0
        |  UNION ALL
        |  SELECT vec_id + 1000000000, label, d, se FROM sv WHERE vec_id % 13 = 0),
        |ca AS (SELECT label, d, sum(se)::HUGEINT AS s_a FROM sv GROUP BY 1, 2),
        |cb AS (SELECT label, d, sum(se)::HUGEINT AS s_b FROM s2 GROUP BY 1, 2),
        |dots AS (
        |  SELECT ca.label,
        |    sum(s_a * s_b) AS dot, sum(s_a * s_a) AS na2, sum(s_b * s_b) AS nb2
        |  FROM ca JOIN cb ON ca.label = cb.label AND ca.d = cb.d
        |  GROUP BY 1),
        |n1 AS (SELECT label, count(DISTINCT vec_id)::BIGINT AS n_v1 FROM sv GROUP BY 1),
        |n2 AS (SELECT label, count(DISTINCT vec_id)::BIGINT AS n_v2 FROM s2 GROUP BY 1)
        |SELECT label, n_v1, n_v2,
        |  round(dot::DOUBLE / (sqrt(na2::DOUBLE) * sqrt(nb2::DOUBLE)), 6)
        |    AS centroid_cos
        |FROM dots JOIN n1 USING (label) JOIN n2 USING (label)
        |ORDER BY label""".stripMargin,
    "q_label_stats" ->
      """WITH sv AS (
        |  SELECT vec_id, label, d,
        |    CAST(round(embedding[d+1]::DOUBLE * 1000000, 0) AS BIGINT) AS se
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |comp AS (
        |  SELECT label, d, sum(se)::BIGINT AS s, count(*) AS n
        |  FROM sv GROUP BY label, d)
        |SELECT label, any_value(n) AS n_vectors,
        |  round(sqrt(sum(s*s)::DOUBLE) / any_value(n) / 1000000.0, 6)
        |    AS centroid_norm
        |FROM comp GROUP BY label ORDER BY label""".stripMargin,
    "q_ann_recall" ->
      s"""WITH $bucketsSql,
         |$pqSql,
         |$pqRotSql,
         |probes AS (
         |  SELECT DISTINCT xor(b.bucket, m.mask) AS bucket
         |  FROM (SELECT bucket FROM buckets WHERE vec_id = 0) b,
         |       (VALUES (0), (1), (2), (4), (8)) m(mask)),
         |lsh10 AS (
         |  SELECT b.vec_id FROM buckets b
         |  JOIN (SELECT bucket FROM buckets WHERE vec_id = 0) qb USING (bucket)
         |  JOIN e ON e.vec_id = b.vec_id, q WHERE b.vec_id <> 0
         |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
         |    b.vec_id LIMIT 10),
         |lshp10 AS (
         |  SELECT b.vec_id FROM buckets b
         |  JOIN probes USING (bucket)
         |  JOIN e ON e.vec_id = b.vec_id, q WHERE b.vec_id <> 0
         |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
         |    b.vec_id LIMIT 10),
         |pw8 AS (
         |  SELECT p, d,
         |    CASE WHEN ('0x'||substr(md5(p::VARCHAR||':'||d::VARCHAR),1,15))::BIGINT % 2 = 0
         |         THEN 1 ELSE -1 END AS w
         |  FROM (SELECT unnest(range(8)) AS p), (SELECT unnest(range(64)) AS d)),
         |bits8 AS (
         |  SELECT vec_id, p,
         |    CASE WHEN sum(se * w) >= 0 THEN 1 ELSE 0 END AS bit
         |  FROM sv JOIN pw8 USING (d) GROUP BY vec_id, p),
         |tb AS (
         |  SELECT vec_id, p // 4 AS tbl,
         |    sum(bit * CAST(pow(2, p % 4) AS BIGINT))::BIGINT AS bucket
         |  FROM bits8 GROUP BY vec_id, p // 4),
         |qtb AS (SELECT tbl, bucket FROM tb WHERE vec_id = 0),
         |lshmt10 AS (
         |  SELECT c.vec_id FROM (
         |    SELECT DISTINCT t.vec_id FROM tb t JOIN qtb USING (tbl, bucket)
         |    WHERE t.vec_id <> 0) c
         |  JOIN e ON e.vec_id = c.vec_id, q
         |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
         |    c.vec_id LIMIT 10),
         |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
         |scored AS (
         |  SELECT e.vec_id, c.cell,
         |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
         |  FROM e, c),
         |ranked AS (
         |  SELECT vec_id, cell, csim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |  FROM scored),
         |assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
         |probe2 AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 2),
         |ivf10 AS (
         |  SELECT a.vec_id FROM assign a
         |  JOIN probe2 USING (cell)
         |  JOIN e ON e.vec_id = a.vec_id, q WHERE a.vec_id <> 0
         |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
         |    a.vec_id LIMIT 10),
         |exact10 AS (
         |  SELECT e.vec_id, 1::BIGINT AS hit FROM e, q WHERE e.vec_id <> 0
         |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
         |    e.vec_id LIMIT 10),
         |pq10 AS (SELECT vec_id FROM pqtop),
         |ipqmembers AS (
         |  SELECT a.vec_id FROM assign a
         |  JOIN probe2 USING (cell) WHERE a.vec_id <> 0),
         |ipqadc AS (
         |  SELECT k.vec_id, sum(t.dot_fp)::BIGINT AS s
         |  FROM rpqcodes k
         |  JOIN ipqmembers m ON m.vec_id = k.vec_id
         |  JOIN rpqqd t ON t.sub = k.sub AND t.cid = k.code
         |  GROUP BY 1),
         |ipqshort AS (
         |  SELECT vec_id FROM ipqadc ORDER BY s DESC, vec_id LIMIT 50),
         |ipq10 AS (
         |  SELECT sh.vec_id FROM ipqshort sh JOIN e ON e.vec_id = sh.vec_id, q
         |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
         |    sh.vec_id LIMIT 10),
         |bbits AS (
         |  SELECT vec_id, d,
         |    CASE WHEN embedding[d+1] >= 0 THEN 1 ELSE 0 END AS bit
         |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
         |bsigs AS (
         |  SELECT vec_id,
         |    sum(CASE WHEN d < 32 THEN bit * CAST(pow(2, d) AS BIGINT)
         |        ELSE 0 END)::BIGINT AS sig_lo,
         |    sum(CASE WHEN d >= 32 THEN bit * CAST(pow(2, d - 32) AS BIGINT)
         |        ELSE 0 END)::BIGINT AS sig_hi
         |  FROM bbits GROUP BY vec_id),
         |bqs AS (SELECT sig_lo AS qlo, sig_hi AS qhi FROM bsigs WHERE vec_id = 0),
         |bshort AS (
         |  SELECT s.vec_id,
         |    (bit_count(xor(s.sig_lo, qlo)) + bit_count(xor(s.sig_hi, qhi)))::BIGINT AS hamming
         |  FROM bsigs s, bqs WHERE s.vec_id <> 0
         |  ORDER BY hamming, s.vec_id LIMIT 50),
         |bin10 AS (
         |  SELECT e.vec_id FROM e JOIN bshort USING (vec_id), q
         |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
         |    e.vec_id LIMIT 10),
         |smm AS (SELECT d, min(se) AS mn, max(se) AS mx FROM sv GROUP BY d),
         |sdeq AS (
         |  SELECT vec_id, d,
         |    mn + ((CASE WHEN mx > mn THEN ((se - mn) * 255) // (mx - mn)
         |           ELSE 0 END) * (mx - mn)) // 255 AS dq
         |  FROM sv JOIN smm USING (d)),
         |sqc AS (SELECT d, se AS qse FROM sv WHERE vec_id = 0),
         |sshort AS (
         |  SELECT c.vec_id FROM sdeq c JOIN sqc USING (d)
         |  WHERE c.vec_id <> 0
         |  GROUP BY c.vec_id
         |  ORDER BY sum(qse * dq) DESC, c.vec_id LIMIT 30),
         |sq810 AS (
         |  SELECT e.vec_id FROM e JOIN sshort USING (vec_id), q
         |  ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) DESC,
         |    e.vec_id LIMIT 10),
         |hnsw10 AS (
         |  SELECT vec_id
         |  FROM read_parquet('$fixturesDir/hnsw_search_sf0.01.parquet/*.parquet')),
         |allm AS (
         |  SELECT vec_id, 'lsh' AS method FROM lsh10
         |  UNION ALL SELECT vec_id, 'lsh_mt' FROM lshmt10
         |  UNION ALL SELECT vec_id, 'lsh_probe' FROM lshp10
         |  UNION ALL SELECT vec_id, 'ivf' FROM ivf10
         |  UNION ALL SELECT vec_id, 'pq' FROM pq10
         |  UNION ALL SELECT vec_id, 'ivfpq' FROM ipq10
         |  UNION ALL SELECT vec_id, 'binary' FROM bin10
         |  UNION ALL SELECT vec_id, 'sq8' FROM sq810
         |  UNION ALL SELECT vec_id, 'hnsw' FROM hnsw10)
         |SELECT method, count(*) AS n_returned,
         |  sum(coalesce(hit, 0))::BIGINT AS n_hits,
         |  round(sum(coalesce(hit, 0))::DOUBLE / 10, 6) AS recall
         |FROM allm LEFT JOIN exact10 USING (vec_id)
         |GROUP BY method ORDER BY method""".stripMargin,
    "q_ann_lsh_probe" ->
      s"""WITH $bucketsSql,
         |probes AS (
         |  SELECT DISTINCT xor(b.bucket, m.mask) AS bucket
         |  FROM (SELECT bucket FROM buckets WHERE vec_id = 0) b,
         |       (VALUES (0), (1), (2), (4), (8)) m(mask))
         |SELECT b.vec_id, b.bucket,
         |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
         |FROM buckets b
         |JOIN probes USING (bucket)
         |JOIN e ON e.vec_id = b.vec_id, q
         |WHERE b.vec_id <> 0
         |ORDER BY score DESC, b.vec_id LIMIT 10""".stripMargin,
    "q_ann_lsh_mt" ->
      """WITH pw8 AS (
        |  SELECT p, d,
        |    CASE WHEN ('0x'||substr(md5(p::VARCHAR||':'||d::VARCHAR),1,15))::BIGINT % 2 = 0
        |         THEN 1 ELSE -1 END AS w
        |  FROM (SELECT unnest(range(8)) AS p), (SELECT unnest(range(64)) AS d)),
        |sv8 AS (
        |  SELECT vec_id, d,
        |    CAST(round(embedding[d+1]::DOUBLE * 1000000, 0) AS BIGINT) AS se
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |bits8 AS (
        |  SELECT vec_id, p,
        |    CASE WHEN sum(se * w) >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM sv8 JOIN pw8 USING (d) GROUP BY vec_id, p),
        |tb AS (
        |  SELECT vec_id, p // 4 AS tbl,
        |    sum(bit * CAST(pow(2, p % 4) AS BIGINT))::BIGINT AS bucket
        |  FROM bits8 GROUP BY vec_id, p // 4),
        |qtb AS (SELECT tbl, bucket FROM tb WHERE vec_id = 0),
        |cand AS (
        |  SELECT DISTINCT t.vec_id FROM tb t JOIN qtb USING (tbl, bucket)
        |  WHERE t.vec_id <> 0),
        |e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)
        |SELECT c.vec_id,
        |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |FROM cand c JOIN e USING (vec_id), q
        |ORDER BY score DESC, c.vec_id LIMIT 10""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH $bucketsSql
         |SELECT b.vec_id, b.bucket,
         |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
         |FROM buckets b
         |JOIN (SELECT bucket FROM buckets WHERE vec_id = 0) qb USING (bucket)
         |JOIN e ON e.vec_id = b.vec_id, q
         |WHERE b.vec_id <> 0
         |ORDER BY score DESC, b.vec_id LIMIT 10""".stripMargin,
    "q_ann_delta" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell, csim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |probe AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 2),
        |cut AS (
        |  SELECT min(vec_id) + ((max(vec_id) - min(vec_id) + 1) * 9) // 10
        |    AS cutoff
        |  FROM e),
        |idx AS (
        |  SELECT r.vec_id, 'indexed' AS segment
        |  FROM ranked r JOIN probe USING (cell), cut
        |  WHERE r.rn = 1 AND r.vec_id < cutoff AND r.vec_id <> 0),
        |del AS (
        |  SELECT e.vec_id, 'delta' AS segment FROM e, cut
        |  WHERE e.vec_id >= cutoff),
        |cand AS (SELECT * FROM idx UNION ALL SELECT * FROM del),
        |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)
        |SELECT cand.vec_id, cand.segment,
        |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |FROM cand JOIN e USING (vec_id), q
        |ORDER BY score DESC, cand.vec_id LIMIT 10""".stripMargin,
    "q_ann_tombstone" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell, csim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |probe AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 2),
        |cut AS (
        |  SELECT min(vec_id) + ((max(vec_id) - min(vec_id) + 1) * 9) // 10
        |    AS cutoff
        |  FROM e),
        |idx AS (
        |  SELECT r.vec_id, 'indexed' AS segment
        |  FROM ranked r JOIN probe USING (cell), cut
        |  WHERE r.rn = 1 AND r.vec_id < cutoff AND r.vec_id <> 0),
        |del AS (
        |  SELECT e.vec_id, 'delta' AS segment FROM e, cut
        |  WHERE e.vec_id >= cutoff),
        |cand AS (SELECT * FROM idx UNION ALL SELECT * FROM del),
        |live AS (SELECT * FROM cand WHERE cand.vec_id % 5 <> 1),
        |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)
        |SELECT live.vec_id, live.segment,
        |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |FROM live JOIN e USING (vec_id), q
        |ORDER BY score DESC, live.vec_id LIMIT 10""".stripMargin,
    "q_ann_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell, csim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        |probe AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 2),
        |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)
        |SELECT a.vec_id, a.cell,
        |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |FROM assign a
        |JOIN probe USING (cell)
        |JOIN e ON e.vec_id = a.vec_id, q
        |WHERE a.vec_id <> 0
        |ORDER BY score DESC, a.vec_id LIMIT 10""".stripMargin,
    "q_ann_filtered" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell, csim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        |probe AS (SELECT cell FROM ranked WHERE vec_id = 0 AND rn <= 4),
        |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)
        |SELECT a.vec_id, e.label::BIGINT AS label, a.cell,
        |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |FROM assign a
        |JOIN probe USING (cell)
        |JOIN e ON e.vec_id = a.vec_id, q
        |WHERE a.vec_id <> 0 AND e.label = 3
        |ORDER BY score DESC, a.vec_id LIMIT 10""".stripMargin,
    "q_ann_sq8" ->
      """WITH sv AS (
        |  SELECT vec_id, d,
        |    CAST(round(embedding[d+1]::DOUBLE * 1000000, 0) AS BIGINT) AS se
        |  FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS d) g),
        |mm AS (SELECT d, min(se) AS mn, max(se) AS mx FROM sv GROUP BY d),
        |codes AS (
        |  SELECT vec_id, d,
        |    CASE WHEN mx > mn THEN ((se - mn) * 255) // (mx - mn)
        |         ELSE 0 END AS code
        |  FROM sv JOIN mm USING (d)),
        |deq AS (
        |  SELECT vec_id, d, mn + (code * (mx - mn)) // 255 AS dq
        |  FROM codes JOIN mm USING (d)),
        |qc AS (SELECT d, se AS qse FROM sv WHERE vec_id = 0),
        |short AS (
        |  SELECT c.vec_id FROM deq c JOIN qc USING (d)
        |  WHERE c.vec_id <> 0
        |  GROUP BY c.vec_id
        |  ORDER BY sum(qse * dq) DESC, c.vec_id LIMIT 30),
        |e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) AS score
        |FROM e JOIN short USING (vec_id), q
        |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,
    "q_cluster_cap" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
         |scored AS (
         |  SELECT e.vec_id, c.cell,
         |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
         |  FROM e, c),
         |ranked AS (
         |  SELECT vec_id, cell, csim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
         |  FROM scored),
         |assign AS (
         |  SELECT vec_id, cell,
         |    CAST(round(csim * 1000000, 0) AS BIGINT) AS csim_micro
         |  FROM ranked WHERE rn = 1),
         |r AS (
         |  SELECT cell, vec_id, csim_micro,
         |    row_number() OVER (PARTITION BY cell
         |      ORDER BY csim_micro DESC, vec_id)::BIGINT AS rk
         |  FROM assign)
         |SELECT cell, rk, vec_id, csim_micro FROM r
         |WHERE rk <= ${ClusterCapK} ORDER BY cell, rk""".stripMargin,
    "q_topic_purity" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        |cl AS (
        |  SELECT a.cell, e.label, count(*) AS n
        |  FROM assign a JOIN e USING (vec_id) GROUP BY 1, 2),
        |r AS (
        |  SELECT cell, label, n,
        |    row_number() OVER (PARTITION BY cell ORDER BY n DESC, label) AS rk,
        |    sum(n) OVER (PARTITION BY cell)::BIGINT AS n_members
        |  FROM cl)
        |SELECT cell, n_members, label AS top_label, n AS top_n,
        |  round(n::DOUBLE / n_members, 6) AS purity
        |FROM r WHERE rk = 1 ORDER BY cell""".stripMargin,
    "q_ivf_balance" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        |tot AS (SELECT count(*) AS n_total FROM assign)
        |SELECT cell, count(*) AS n_vecs,
        |  round(count(*)::DOUBLE / n_total, 6) AS frac,
        |  round(count(*)::DOUBLE * 8 / n_total, 6) AS skew
        |FROM assign, tot GROUP BY cell, n_total ORDER BY cell""".stripMargin,
    "q_ann_ivf_batch" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.cell,
        |    round(list_dot_product(e.v, c.cv) / (e.nrm * c.cn), 6) AS csim
        |  FROM e, c),
        |ranked AS (
        |  SELECT vec_id, cell, csim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
        |  FROM scored),
        |assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cell FROM ranked
        |  WHERE vec_id < 8 AND rn <= 2),
        |qv AS (SELECT vec_id AS query_id, v, nrm FROM e WHERE vec_id < 8),
        |sc AS (
        |  SELECT p.query_id, a.vec_id,
        |    round(list_dot_product(e.v, qv.v) / (e.nrm * qv.nrm), 6) AS score
        |  FROM assign a
        |  JOIN probes p USING (cell)
        |  JOIN e ON e.vec_id = a.vec_id
        |  JOIN qv ON qv.query_id = p.query_id
        |  WHERE a.vec_id <> p.query_id),
        |rk AS (
        |  SELECT query_id, vec_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id) AS rank
        |  FROM sc)
        |SELECT query_id, rank::BIGINT AS rank, vec_id, score
        |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
  )
}
