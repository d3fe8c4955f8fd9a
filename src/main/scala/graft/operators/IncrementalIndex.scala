package graft
package operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL index maintenance — the LSM lifecycle for the
  * partitioned ANN serve, and the scale-honest alternative to
  * [[Hnsw.resealSharded]]'s full rebuild: resealing re-lays-out and
  * re-indexes the ENTIRE corpus every time measured growth trips the
  * amortization rule, which is the right amortized cost bound but the
  * wrong constant at 100 TB — a 25% delta triggers a 125% rebuild.
  * Here ingest cost is proportional to the NEW data only:
  *
  *   - [[sealDelta]] freezes the current delta as its OWN new segment
  *     (one index build over delta-sized data — never a corpus touch);
  *   - corrections (a delta row re-delivering a sealed vec_id) become
  *     SHADOWS, not rewrites: the new segment records which older ids
  *     it supersedes, and every serve excludes a segment's shadowed
  *     members from its REPORT (navigable, never reported — the
  *     tombstone family rule), so the freshest row wins without
  *     touching any sealed file;
  *   - [[compactOnce]] is the size-tiered merge every LSM store runs:
  *     the smallest ADJACENT segment pair whose merged image still
  *     fits the node budget folds into one segment (latest-wins, rows
  *     superseded by newer segments physically dropped), rebuild cost
  *     proportional to the MERGED pair, untouched segments untouched.
  *
  * Serving is the family scatter-gather: one [[Hnsw.IndexImage]] per
  * segment, per-segment beam with its shadow exclude, candidates into
  * the exact k-bounded merge ([[Hnsw.shardedGather]]). The un-sealed
  * live delta composes as the usual exact brute arm
  * ([[serveWithDelta]]).
  *
  * Scale bounds, stated: the per-segment exclude sets are
  * CORRECTION-bounded (delta ∩ older ids at each seal — zero on an
  * append-only stream), never corpus-bounded, and compaction is the
  * operation that physically clears them; segment count is bounded by
  * the caller's [[compactUntil]] policy. Single-writer contract on
  * the work dir (the [[graft.store.ChunkStore]] manifest discipline);
  * layout mutations are write-new-then-rename.
  *
  * Reference anchor: the reference rebuilds its whole SQLite vector
  * table on re-index (`/root/reference/src/core/vector-db/adapters/
  * sqlite.ts` upserts row-at-a-time); this is the same freshness
  * contract re-expressed for an immutable-segment distributed store.
  */
object IncrementalIndex {

  /** One sealed segment: ordinal (newer = larger, latest-wins) and
    * its corpus dir (`embeddings.parquet` inside, index artifacts
    * session-cached per dir by [[Hnsw.indexFor]]). */
  final case class Seg(ord: Int, dir: String)

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The work dir's segment list, ordinal-sorted — the manifest IS
    * the `seg_<ord>_g<gen>` listing (rename-published, so a reader
    * never sees a half-written segment). The GENERATION suffix exists
    * because segment content is immutable-per-path: [[Hnsw.indexFor]]
    * and [[Hnsw.imageFor]] cache per directory path, and at 100 TB
    * the path IS the artifact identity (object-store renames aren't
    * atomic; write-new is the only safe publish) — so [[compactOnce]]
    * publishes a merged segment under a FRESH path (gen+1) instead of
    * rewriting the old one behind every cache. */
  def segs(spark: SparkSession, work: String): Seq[Seg] = {
    val root = new org.apache.hadoop.fs.Path(s"$work/segments")
    val f = fs(spark, work)
    if (!f.exists(root)) Seq.empty
    else
      f.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("seg_"))
        .map { n =>
          val parts = n.stripPrefix("seg_").split("_g")
          (parts(0).toInt, parts.lift(1).fold(0)(_.toInt), n)
        }
        .sortBy(t => (t._1, t._2))
        .map { case (ord, _, name) =>
          Seg(ord, s"$work/segments/$name")
        }
  }

  /** Seed the lifecycle from a base corpus: budget-derived S-way
    * residue split ([[Hnsw.shardCountFor]]'s math, [[Hnsw.shardDirsFor]]'s
    * ONE-partitioned-pass discipline) written as segments 0..S-1 under
    * the work dir. */
  def initSegments(spark: SparkSession, corpusDir: String, work: String,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): Seq[Seg] = {
    val stats = Search.embNormed(spark, corpusDir)
      .agg(count(lit(1)), first(size(col("embedding")))).head
    val n = stats.getLong(0)
    val dim = if (stats.isNullAt(1)) 0 else stats.getInt(1)
    val s = Hnsw.shardCountFor(n, dim, budgetBytes)
    val staged = s"$work/_staged_init"
    Tables.embeddings(spark, corpusDir)
      .withColumn("shard", pmod(col("vec_id"), lit(s.toLong)))
      .write.partitionBy("shard").mode("overwrite").parquet(staged)
    val f = fs(spark, work)
    val out = (0 until s).map { i =>
      val d = s"$work/segments/seg_${i}_g0"
      f.mkdirs(new org.apache.hadoop.fs.Path(d))
      val part = new org.apache.hadoop.fs.Path(staged, s"shard=$i")
      if (f.exists(part))
        f.rename(part, new org.apache.hadoop.fs.Path(d, "embeddings.parquet"))
      else
        Tables.embeddings(spark, corpusDir).filter(lit(false))
          .write.parquet(s"$d/embeddings.parquet")
      Seg(i, d)
    }
    f.delete(new org.apache.hadoop.fs.Path(staged), true)
    out
  }

  /** `(vec_id)` rows segment `ord` SUPERSEDES in older segments —
    * empty (and absent on disk) for an append-only seal. */
  private[graft] def shadowOf(spark: SparkSession, work: String,
      ord: Int): DataFrame = {
    val p = s"$work/shadow/seg_$ord.parquet"
    if (fs(spark, work).exists(new org.apache.hadoop.fs.Path(p)))
      spark.read.parquet(p)
    else {
      import spark.implicits._
      Seq.empty[Long].toDF("vec_id")
    }
  }

  /** Freeze `delta` (one row per vec_id — [[graft.streaming
    * .StreamingShardedServe.deltaRows]]'s latest-wins contract) as the
    * next segment: ONE index build over delta-sized data, plus the
    * seal-time shadow derivation — `delta ids ∩ older member ids`, a
    * column-pruned id scan whose OUTPUT is correction-bounded. Returns
    * None on an empty delta. */
  def sealDelta(spark: SparkSession, work: String,
      delta: DataFrame): Option[Seg] = {
    val rows = delta.select(col("vec_id"),
      col("embedding").cast("array<float>").as("embedding"))
    if (rows.isEmpty) return None
    val existing = segs(spark, work)
    val ord = existing.map(_.ord).maxOption.fold(0)(_ + 1)
    val d = s"$work/segments/seg_${ord}_g0"
    val stagedSeg = s"$work/_staged_seg_$ord"
    rows.write.mode("overwrite").parquet(s"$stagedSeg/embeddings.parquet")
    // corrections: delta ids already members of an older segment
    val olderIds = existing.map(s0 => spark.read
        .parquet(s"${s0.dir}/embeddings.parquet").select("vec_id"))
      .reduceOption(_.unionByName(_))
    olderIds.foreach { ids =>
      rows.select("vec_id").join(ids, Seq("vec_id"), "left_semi")
        .distinct()
        .write.mode("overwrite")
        .parquet(s"$work/shadow/seg_$ord.parquet")
    }
    fs(spark, work).rename(new org.apache.hadoop.fs.Path(stagedSeg),
      new org.apache.hadoop.fs.Path(d))
    Hnsw.indexFor(spark, d) // the delta-sized build, eagerly
    Some(Seg(ord, d))
  }

  /** Per-segment report excludes: segment i must not report a member
    * a NEWER segment superseded — the union of shadows of ords > i
    * (correction-bounded by construction; [[compactOnce]] physically
    * clears what it merges away), plus the caller's extra exclusions
    * (the live-delta arm's ids). */
  private[graft] def excludesFor(spark: SparkSession, work: String,
      ss: Seq[Seg], extra: Set[Long]): Map[Int, Set[Long]] = {
    import spark.implicits._
    val shadows: Seq[(Int, Set[Long])] = ss.map(s0 =>
      s0.ord -> shadowOf(spark, work, s0.ord)
        .select("vec_id").as[Long].collect().toSet)
    ss.map { s0 =>
      s0.ord -> (shadows.filter(_._1 > s0.ord)
        .map(_._2).fold(Set.empty[Long])(_ ++ _) ++ extra)
    }.toMap
  }

  /** Query-id vectors resolved latest-wins across the segments: the
    * newest segment holding the id supplies the row (point lookups —
    * the vec_id filter pushes into every segment scan). */
  private[graft] def queryVecs(spark: SparkSession, ss: Seq[Seg],
      queries: DataFrame): Array[(Long, Array[Float], Double)] = {
    import graft.functions.VectorFunctions._
    val qids = queries.select(col("query_id").cast("long").as("vec_id"))
    ss.map { s0 =>
      spark.read.parquet(s"${s0.dir}/embeddings.parquet")
        .join(broadcast(qids), "vec_id")
        .select(col("vec_id"), col("embedding"), lit(s0.ord).as("ord"))
    }.reduceOption(_.unionByName(_)).fold(
      Array.empty[(Long, Array[Float], Double)]) { all =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("ord").desc)
      all.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .withColumn("nrm", l2norm(col("embedding")))
        .select("vec_id", "embedding", "nrm")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
          r.getDouble(2)))
    }
  }

  /** Scatter-gather over the CURRENT segments: one image per segment
    * task (the [[Hnsw.serveShardedDistributed]] shape), per-segment
    * beam with that segment's shadow exclude — shadowed ids stay
    * NAVIGABLE and are never reported, and each beam backfills its
    * top-k past them, so the k-bounded gather merges only live
    * latest-wins candidates. */
  def serve(spark: SparkSession, work: String, queries: DataFrame,
      ef: Int = 16, k: Int = 10,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): DataFrame =
    Hnsw.shardedGather(spark, k,
      segCands(spark, work, queries, ef, k, Set.empty, budgetBytes))

  private def segCands(spark: SparkSession, work: String,
      queries: DataFrame, ef: Int, k: Int, extraExclude: Set[Long],
      budgetBytes: Long): DataFrame = {
    import spark.implicits._
    val ss = segs(spark, work)
    val excl = excludesFor(spark, work, ss, extraExclude)
    val qrows = queryVecs(spark, ss, queries)
    val imgs = Hnsw.segmentImages(spark, ss.map(_.dir), budgetBytes)
    val qbc = spark.sparkContext.broadcast(qrows)
    spark.sparkContext
      .parallelize(ss.map(_.ord).zip(imgs), math.max(ss.size, 1))
      .flatMap { case (ord, img) =>
        val ex = excl.getOrElse(ord, Set.empty)
        qbc.value.iterator.flatMap { case (qid, qv, qn) =>
          Hnsw.serveVec(img, qv, qn, selfId = qid, ef = ef, k = k,
            exclude = ex).map { case (id, sc) => (qid, id, sc) }
        }
      }.toDF("query_id", "vec_id", "score")
  }

  /** [[serve]] with the UN-SEALED live delta composed in: the delta
    * is scanned exactly (ingest-bounded), its ids shadow every sealed
    * segment (latest-wins), both arms merge in the one k-bounded
    * gather — [[Hnsw.serveShardedIngestDelta]]'s contract over the
    * incremental layout. */
  def serveWithDelta(spark: SparkSession, work: String, delta: DataFrame,
      queries: DataFrame, ef: Int = 16, k: Int = 10,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val deltaIds = delta.select(col("vec_id")).as[Long].collect().toSet
    val sealedCands = segCands(spark, work, queries, ef, k, deltaIds,
      budgetBytes)
    val qrows = queryVecs(spark, segs(spark, work), queries)
    val qv = qrows.toSeq
      .toDF("query_id", "qv", "qn")
    val deltaCands = delta.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .withColumn("nrm", l2norm(col("embedding")))
      .crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(cosinePrenormed(dot(col("embedding"), col("qv")),
          col("nrm"), col("qn")), 6))
      .select("query_id", "vec_id", "score")
    Hnsw.shardedGather(spark, k, sealedCands.unionByName(deltaCands))
  }

  /** ONE size-tiered compaction step: merge the ADJACENT segment pair
    * with the smallest combined row count whose merged image still
    * fits the budget. Latest-wins inside the pair (the newer member's
    * row survives), rows superseded by a NEWER segment's shadow are
    * physically dropped, and the merged segment inherits BOTH members'
    * shadow tables (its rows still supersede older copies). The merged
    * segment takes the newer ordinal — adjacency is what keeps every
    * other segment's latest-wins position unchanged. Rebuild cost:
    * the merged pair's rows, nothing else; every other segment dir and
    * index is untouched. Returns the merged (older, newer) ordinals,
    * or None when no adjacent pair fits. */
  def compactOnce(spark: SparkSession, work: String,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): Option[(Int, Int)] = {
    val ss = segs(spark, work)
    if (ss.size < 2) return None
    val counts = ss.map(s0 => s0.ord ->
      spark.read.parquet(s"${s0.dir}/embeddings.parquet").count()).toMap
    val dim = ss.iterator.map(s0 =>
        spark.read.parquet(s"${s0.dir}/embeddings.parquet")
          .select(size(col("embedding"))).head(1))
      .collectFirst { case rs if rs.nonEmpty => rs.head.getInt(0) }
      .getOrElse(0)
    val bpv = Hnsw.imageBytesPerVec(dim)
    val pair = ss.zip(ss.tail)
      .filter { case (a, b) => (counts(a.ord) + counts(b.ord)) * bpv <=
        budgetBytes }
      .sortBy { case (a, b) => (counts(a.ord) + counts(b.ord),
        a.ord) }
      .headOption
    pair.map { case (older, newer) =>
      val oldRows = spark.read.parquet(s"${older.dir}/embeddings.parquet")
      val newRows = spark.read.parquet(s"${newer.dir}/embeddings.parquet")
      val newerShadows = segs(spark, work)
        .filter(_.ord > newer.ord)
        .map(s0 => shadowOf(spark, work, s0.ord))
        .reduceOption(_.unionByName(_))
      // schemas may differ across the pair: init segments carry the
      // full embeddings-table row (metadata columns included), sealed
      // delta segments carry the (vec_id, embedding) ingest contract —
      // missing columns null-fill (the serve reads only the contract
      // columns; metadata survives where it existed)
      val merged0 = oldRows
        .join(newRows.select("vec_id"), Seq("vec_id"), "left_anti")
        .unionByName(newRows, allowMissingColumns = true)
      val merged = newerShadows.fold(merged0)(sh =>
        merged0.join(broadcast(sh.distinct()), Seq("vec_id"), "left_anti"))
      val staged = s"$work/_staged_compact_${newer.ord}"
      merged.write.mode("overwrite").parquet(s"$staged/embeddings.parquet")
      val mergedShadow = shadowOf(spark, work, older.ord)
        .unionByName(shadowOf(spark, work, newer.ord)).distinct()
      val stagedShadow = s"$work/_staged_shadow_${newer.ord}.parquet"
      mergedShadow.write.mode("overwrite").parquet(stagedShadow)
      // publish under a FRESH path (gen+1): the per-dir index/image
      // caches must never see new bytes behind an old identity
      val gen = newer.dir.split("_g").lift(1).fold(0)(_.toInt)
      val mergedDir =
        s"$work/segments/seg_${newer.ord}_g${gen + 1}"
      val f = fs(spark, work)
      f.delete(new org.apache.hadoop.fs.Path(older.dir), true)
      f.delete(new org.apache.hadoop.fs.Path(newer.dir), true)
      f.rename(new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(mergedDir))
      f.delete(new org.apache.hadoop.fs.Path(
        s"$work/shadow/seg_${older.ord}.parquet"), true)
      f.delete(new org.apache.hadoop.fs.Path(
        s"$work/shadow/seg_${newer.ord}.parquet"), true)
      f.rename(new org.apache.hadoop.fs.Path(stagedShadow),
        new org.apache.hadoop.fs.Path(
          s"$work/shadow/seg_${newer.ord}.parquet"))
      Hnsw.indexFor(spark, mergedDir)
      (older.ord, newer.ord)
    }
  }

  /** Compact until the segment count reaches `maxSegs` or no adjacent
    * pair fits the budget — the caller-policy loop over
    * [[compactOnce]]. Returns the steps taken. */
  def compactUntil(spark: SparkSession, work: String, maxSegs: Int,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (segs(spark, work).size > maxSegs) {
      compactOnce(spark, work, budgetBytes) match {
        case Some(step) => out += step
        case None => return out.toSeq
      }
    }
    out.toSeq
  }

  /** The lifecycle as a registry row: the corpus splits at the family
    * 90% cutoff ([[Ann.deltaCutoff]]) — the sealed head seeds the
    * segment layout (planted per-segment budget so the head spans
    * multiple segments, the [[Hnsw.qHnswSharded]] convention), the
    * tail arrives as a delta and is SEALED INCREMENTALLY as its own
    * segment (contrast [[Hnsw.qHnswShardedDelta]], which brute-scans
    * the same tail), then 8 queries serve top-5 through the shadow-
    * aware scatter-gather. Golden oracle like every trained-graph
    * serve; IncrementalIndexSpec pins seal cost shape, corrections,
    * compaction, and the reference merge. */
  private val workDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def qHnswIncr(spark: SparkSession, dir: String): DataFrame = {
    val work = workDirs.computeIfAbsent(dir, { _ =>
      val w = java.nio.file.Files
        .createTempDirectory("graft_incr_idx").toString
      val e = Tables.embeddings(spark, dir)
      val cut = Ann.deltaCutoff(Search.embNormed(spark, dir))
      val sealedDir = Hnsw.sealedDirFor(spark, dir)
      // plant a 4-segment head: budget = head image / 4 (the planted-S
      // convention every sharded registry row uses)
      val stats = Search.embNormed(spark, sealedDir)
        .agg(count(lit(1)), first(size(col("embedding")))).head
      val budget = math.max(1L,
        stats.getLong(0) * Hnsw.imageBytesPerVec(stats.getInt(1)) / 4)
      initSegments(spark, sealedDir, w, budget)
      val delta = e.crossJoin(broadcast(cut))
        .filter(col("vec_id") >= col("cutoff"))
        .select("vec_id", "embedding")
      sealDelta(spark, w, delta)
      w
    })
    serve(spark, work, spark.range(8).toDF("query_id"), ef = 16, k = 5)
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hnsw_incr" -> (qHnswIncr _)
  )

  val oracles: Map[String, String] = Map(
    "q_hnsw_incr" ->
      s"""SELECT * FROM
         |read_parquet('$fixturesDir/hnsw_incr_sf0.01.parquet/*.parquet')
         |ORDER BY query_id, rank""".stripMargin
  )
}
