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

  /** Layout mutations are write-new-then-rename; a rename that FAILS
    * (Hadoop signals failure by returning false, not by throwing) must
    * abort the publish, never fall through to the cleanup deletes — a
    * deleted-source-without-published-destination is exactly the data
    * loss the staging discipline exists to prevent. */
  private def renameOrDie(f: org.apache.hadoop.fs.FileSystem,
      src: String, dst: String): Unit = {
    if (!f.rename(new org.apache.hadoop.fs.Path(src),
        new org.apache.hadoop.fs.Path(dst)))
      throw new java.io.IOException(
        s"publish rename failed: $src -> $dst (staged data left intact)")
  }

  /** `seg_<ord>_g<gen>` basename → (ord, gen); None for anything else
    * (staged dirs, stray files). Parses the BASENAME only — a work
    * path that itself contains `_g` must not leak into the parse. */
  private def parseSegName(name: String): Option[(Int, Int)] =
    if (!name.startsWith("seg_")) None
    else {
      val parts = name.stripPrefix("seg_").split("_g")
      try Some((parts(0).toInt, parts.lift(1).fold(0)(_.toInt)))
      catch { case _: NumberFormatException => None }
    }

  /** `seg_<ord>[_g<gen>].parquet` shadow basename → (ord, gen);
    * unsuffixed legacy names read as generation 0. */
  private def parseShadowName(name: String): Option[(Int, Int)] =
    if (!name.endsWith(".parquet")) None
    else parseSegName(name.stripSuffix(".parquet"))

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
        .flatMap(n => parseSegName(n).map { case (ord, gen) =>
          (ord, gen, n)
        })
        // equal ordinals dedupe to the MAX generation: [[compactOnce]]
        // publishes the merged segment under gen+1 BEFORE deleting the
        // superseded paths, so a crash between publish and cleanup
        // leaves both on disk — the listing must serve the newer one
        .groupBy(_._1).values.map(_.maxBy(_._2)).toSeq
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
      writeSidecars(spark, d)
      Seg(i, d)
    }
    f.delete(new org.apache.hadoop.fs.Path(staged), true)
    out
  }

  /** Shadow tables carry the SAME generation suffix as their segment
    * (`shadow/seg_<ord>_g<gen>.parquet`) for the same reason: a
    * compaction publishes the merged shadow under a FRESH path and
    * deletes the superseded files last, so a crash at any point leaves
    * a resolvable (max-generation) shadow on disk instead of a
    * half-swapped one. Unsuffixed legacy names read as generation 0. */
  private[graft] def shadowPathOf(spark: SparkSession, work: String,
      ord: Int): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$work/shadow")
    val f = fs(spark, work)
    if (!f.exists(root)) None
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .flatMap(n => parseShadowName(n).collect {
        case (o, g) if o == ord => (g, n)
      })
      .sortBy(-_._1).headOption.map(t => s"$work/shadow/${t._2}")
  }

  /** `(vec_id)` rows segment `ord` SUPERSEDES in older segments —
    * empty (and absent on disk) for an append-only seal. */
  private[graft] def shadowOf(spark: SparkSession, work: String,
      ord: Int): DataFrame =
    shadowPathOf(spark, work, ord).map(spark.read.parquet(_)).getOrElse {
      import spark.implicits._
      Seq.empty[Long].toDF("vec_id")
    }

  /** Per-segment SIDECARS, written inside the segment dir at staging
    * time so they ride the atomic publish rename:
    *   - `_idbloom` — the member-id Bloom words table
    *     ([[graft.model.IdFilters.bloomWordsDf]]): seal-time shadow
    *     derivation probes these instead of scanning every older
    *     segment's id column, making seal cost independent of total
    *     corpus id volume (the [[graft.store.ChunkStore.getViaBloom]]
    *     skip-index pattern applied to the LSM);
    *   - `_centroid` — the member mean vector (cv, cn, n): the
    *     segment's geometric identity for ROUTED serving
    *     ([[serveRouted]] — the [[Hnsw.routeCellsAdaptive]] machinery
    *     over the LSM segment list).
    * Both are (re)derived from the segment's OWN rows — delta-sized at
    * seal, pair-sized at compaction, never a corpus touch. */
  private def writeSidecars(spark: SparkSession, segDir: String): Unit = {
    import spark.implicits._
    import graft.model.IdFilters
    val ids = spark.read.parquet(s"$segDir/embeddings.parquet")
      .select("vec_id")
    val n = ids.count()
    val (nbits, hashes) = IdFilters.bloomParams(n)
    IdFilters.bloomWordsDf(ids, "vec_id", nbits, hashes)
      .coalesce(1).write.mode("overwrite").parquet(s"$segDir/_idbloom")
    val cv: Array[Double] =
      if (n == 0) Array.empty
      else spark.read.parquet(s"$segDir/embeddings.parquet")
        .select(posexplode(col("embedding").cast("array<double>")))
        .groupBy("pos").agg(avg("col").as("v"))
        .orderBy("pos").select("v").as[Double].collect()
    val cn = math.sqrt(cv.map(x => x * x).sum)
    Seq((cv.toSeq, cn, n)).toDF("cv", "cn", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$segDir/_centroid")
  }

  /** Session cache of per-segment id Blooms, keyed by segment path +
    * sidecar mtime — segment content is immutable per path (the
    * generation-suffix discipline), and the mtime fingerprint closes
    * the delete-and-recreate-at-same-path hole (seg_0_g0 basenames
    * repeat across work-dir lifetimes). LRU-bounded: blooms are up to
    * 8 MB each, and a long-lived serving session must not accrete one
    * per segment ever touched. */
  private[graft] val idSidecars =
    new graft.model.LruCache[String, graft.model.IdFilters.IdBloom](64)

  private def idBloomFor(spark: SparkSession,
      segDir: String): Option[graft.model.IdFilters.IdBloom] = {
    val p = new org.apache.hadoop.fs.Path(s"$segDir/_idbloom")
    val f = fs(spark, segDir)
    if (!f.exists(p)) None // legacy segment — caller falls back
    else {
      val mt = f.getFileStatus(p).getModificationTime
      Some(idSidecars.getOrElseUpdate(s"$segDir#$mt") {
        graft.model.IdFilters.bloomFromSidecar(spark, p.toString)
      })
    }
  }

  /** Past this many flagged ids a per-segment verification switches
    * from an isin-pushdown point lookup to a broadcast semi-join. */
  private val IsinPushdownCap = 1 << 14

  /** Route selection for the seal-time shadow derivation: the one-job
    * full-scan semi-join wins while the older id volume is small —
    * the 20×/50× probes measured it directly (0.8 s vs 2.8 s at
    * n=10⁴, 0.9 s vs 3.2 s at n=2.5·10⁴: one job over ALL ids barely
    * moves with n at toy scale, while the sidecar arm pays ~3 small
    * jobs per segment) — and loses when the scan itself is the cost:
    * at 10⁹-10¹⁰ ids (the 100 TB shape) re-reading every id ever
    * sealed per seal is the standing tax the sidecar probing exists
    * to remove. The rule keeps the scan while older ids ≤
    * max(64 × delta, 2²⁷ ≈ 134M — a few seconds of one columnar scan
    * at cluster rates, far above every measured point where the scan
    * still won) and probes sidecars beyond. */
  private val FullScanBias = 64L
  private val FullScanFloor = 1L << 27

  /** Seal-time correction derivation — `ids ∩ older member ids`,
    * route-selected by [[FullScanBias]]:
    *   - FULL-SCAN arm (small corpora): union of the older segments'
    *     id columns, one semi-join job;
    *   - SIDECAR arm (the 100 TB shape): each older segment's
    *     `_idbloom` filters the delta ids map-side (delta-sized work,
    *     NO segment id scan); only flagged ids — correction-bounded
    *     plus the bitmap's ~4e-4 false-positive slice — verify against
    *     the segment by point lookup. A legacy segment without a
    *     sidecar falls back to the semi-join for that segment only.
    * Both arms derive the identical set (spec-pinned); the probe times
    * them in isolation. */
  private[graft] def deriveShadowIds(spark: SparkSession,
      existing: Seq[Seg], ids: DataFrame): Option[DataFrame] = {
    if (existing.isEmpty) return None
    val olderRows = existing.map(s0 => segMeta(spark, s0.dir)._1).sum
    val deltaN = ids.count()
    if (olderRows <= math.max(FullScanBias * math.max(deltaN, 1L),
        FullScanFloor))
      Some(ids.join(
        existing.map(s0 => spark.read
            .parquet(s"${s0.dir}/embeddings.parquet").select("vec_id"))
          .reduce(_.unionByName(_)),
        Seq("vec_id"), "left_semi"))
    else deriveShadowIdsSidecar(spark, existing, ids)
  }

  /** The sidecar arm of [[deriveShadowIds]], exposed separately for
    * the scale probe's isolation timing. */
  private[graft] def deriveShadowIdsSidecar(spark: SparkSession,
      existing: Seq[Seg], ids: DataFrame): Option[DataFrame] = {
    import spark.implicits._
    existing.flatMap { s0 =>
      val flagged: DataFrame = idBloomFor(spark, s0.dir) match {
        case Some(bloom) =>
          ids.as[Long].mapPartitions(
            _.filter(bloom.mayContain)).toDF("vec_id")
        case None => ids // legacy: every delta id "flagged"
      }
      val nf = flagged.count()
      if (nf == 0) None
      else if (nf <= IsinPushdownCap) {
        val flaggedIds = flagged.as[Long].collect()
        Some(spark.read.parquet(s"${s0.dir}/embeddings.parquet")
          .select("vec_id").filter(col("vec_id").isin(flaggedIds: _*)))
      } else
        Some(spark.read.parquet(s"${s0.dir}/embeddings.parquet")
          .select("vec_id")
          .join(broadcast(flagged), Seq("vec_id"), "left_semi"))
    }.reduceOption(_.unionByName(_))
  }

  /** Freeze `delta` (one row per vec_id — [[graft.streaming
    * .StreamingShardedServe.deltaRows]]'s latest-wins contract) as the
    * next segment: ONE index build over delta-sized data, plus the
    * seal-time shadow derivation. The delta is MATERIALIZED first
    * (staged segment write) and everything else — the emptiness check,
    * the shadow, the sidecars — derives from reading that snapshot
    * back, so a non-deterministic source cannot make the shadow
    * disagree with the rows actually sealed. Shadow derivation is
    * SIDECAR-probed: each older segment's `_idbloom` filters the delta
    * ids map-side (delta-sized work per segment, no corpus id scan);
    * only flagged ids — correction-bounded plus the bitmap's ~4e-4
    * false-positive slice — verify against the segment by point
    * lookup. A legacy segment without a sidecar falls back to the
    * direct semi-join for that segment only. Returns None on an empty
    * delta. */
  def sealDelta(spark: SparkSession, work: String,
      delta: DataFrame): Option[Seg] = {
    import spark.implicits._
    val existing = segs(spark, work)
    val ord = existing.map(_.ord).maxOption.fold(0)(_ + 1)
    val d = s"$work/segments/seg_${ord}_g0"
    val stagedSeg = s"$work/_staged_seg_$ord"
    delta.select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$stagedSeg/embeddings.parquet")
    val sealedRows = spark.read.parquet(s"$stagedSeg/embeddings.parquet")
    if (sealedRows.isEmpty) {
      fs(spark, work).delete(new org.apache.hadoop.fs.Path(stagedSeg),
        true)
      return None
    }
    writeSidecars(spark, stagedSeg)
    // corrections: sealed ids already members of an older segment —
    // derived from the materialized snapshot, sidecar-probed
    val shadow = deriveShadowIds(spark, existing,
      sealedRows.select("vec_id"))
    // shadow publishes BEFORE the segment: a correction visible
    // without its shadow would double-report; an orphan shadow for a
    // never-published ordinal is inert (excludes read only live ords)
    shadow.foreach {
      _.distinct().write.mode("overwrite")
        .parquet(s"$work/shadow/seg_${ord}_g0.parquet")
    }
    renameOrDie(fs(spark, work), stagedSeg, d)
    Hnsw.indexFor(spark, d) // the delta-sized build, eagerly
    Some(Seg(ord, d))
  }

  /** Derivation counters — the spec's and probe's gauges (the
    * [[graft.api.IndexPipeline.mutationDerivations]] pattern) that
    * repeat serves against an UNCHANGED work dir re-run zero shadow
    * collects, zero segment query-vector scans, and zero segment
    * metadata jobs. */
  private[graft] val shadowDerivations =
    new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val queryVecDerivations =
    new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val segMetaJobs =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** The work dir's state identity: segment + shadow basenames. Every
    * layout mutation moves it — a seal adds a segment (and possibly a
    * shadow), a compaction publishes FRESH generation paths for both —
    * so caches keyed on it can never serve a stale state; cost is two
    * directory listings, never a data read. */
  private def stateKey(spark: SparkSession, work: String): String = {
    val f = fs(spark, work)
    def ls(p: String): Seq[String] = {
      val hp = new org.apache.hadoop.fs.Path(p)
      if (!f.exists(hp)) Seq.empty
      else f.listStatus(hp).toSeq.map(_.getPath.getName).sorted
    }
    (ls(s"$work/segments") ++ Seq("|") ++ ls(s"$work/shadow"))
      .mkString(",")
  }

  /** Per-work-state exclusion state, derived ONCE per state key —
    * never re-collected per serve call, and bounded by the
    * [[graft.model.IdFilters]] discipline (the fix the `searchAnn`
    * dead-id path graduated to): up to the driver cap the per-segment
    * filters are exact cumulative Sets; past it ONE Bloom bitmap over
    * ALL shadow ids stands in for every segment (a superset per ord —
    * sound because flagged candidates verify against the ord's actual
    * newer-shadow tables via `verifyPaths`, and cleared candidates are
    * provably in no shadow at all). */
  private[graft] final case class ExcludeState(key: String, cap: Long,
      exact: Option[Map[Int, Set[Long]]],
      bloom: Option[graft.model.IdFilters.IdBloom],
      verifyPaths: Map[Int, Seq[String]])

  private[graft] val excludeStates =
    new graft.model.LruCache[String, ExcludeState](64)

  private def excludeStateFor(spark: SparkSession, work: String,
      ss: Seq[Seg], key: String): ExcludeState = {
    val capNow = graft.model.IdFilters.driverCap(spark)
    excludeStates.getOrElseUpdate(s"$work#$key#$capNow") {
      import spark.implicits._
      shadowDerivations.incrementAndGet()
      val cap = capNow
      val shadows: Seq[(Int, Option[String], Long)] = ss.map { s0 =>
        val p = shadowPathOf(spark, work, s0.ord)
        (s0.ord, p, p.fold(0L)(spark.read.parquet(_).count()))
      }
      val total = shadows.map(_._3).sum
      if (total <= cap) {
        val sets: Seq[(Int, Set[Long])] = shadows.map {
          case (ord, p, _) => ord -> p.fold(Set.empty[Long])(
            spark.read.parquet(_).select("vec_id")
              .as[Long].collect().toSet)
        }
        val perOrd = ss.map { s0 =>
          s0.ord -> sets.filter(_._1 > s0.ord).map(_._2)
            .fold(Set.empty[Long])(_ ++ _)
        }.toMap
        ExcludeState(key, cap, Some(perOrd), None, Map.empty)
      } else {
        val allShadows = shadows.flatMap(_._2)
          .map(spark.read.parquet(_).select("vec_id"))
          .reduce(_.unionByName(_))
        val bloom = graft.model.IdFilters
          .build(spark, allShadows, "vec_id", total, cap)
          .asInstanceOf[graft.model.IdFilters.IdBloom]
        val verify = ss.map { s0 =>
          s0.ord -> shadows
            .filter(t => t._1 > s0.ord && t._3 > 0).flatMap(_._2)
        }.toMap
        ExcludeState(key, cap, None, Some(bloom), verify)
      }
    }
  }

  /** Per-(work state, query batch) resolved query vectors — the
    * segment point-lookup scans run once per state per batch, not per
    * serve call. LRU-bounded (each entry is a batch of vectors — a
    * long-lived serving session crosses many batches) and keyed on an
    * md5 DIGEST of the sorted qid list, not the list itself (r12
    * hygiene: the raw-list key made every entry carry its batch's ids
    * twice). */
  private[graft] val qvecCache = new graft.model.LruCache[
    String, Array[(Long, Array[Float], Double)]](64)

  /** All segments' embedding rows in ONE multi-path scan, each row
    * carrying its segment ORDINAL derived from its file path (the
    * rename-published `seg_<ord>[_g<gen>]` basename discipline —
    * [[parseSegName]]'s contract, expressed as a codegen regex). The
    * r13 first cut built this as an S-leg `unionByName` of per-segment
    * scans, which is correct but scales its PLAN with the segment
    * count: at LSM-realistic S (thousands of sealed segments) Catalyst
    * pays O(S) analysis/optimization per serve and the executed plan
    * carries S scan legs and S joins (guide §3.3 wide unions / §7.3
    * planning time). One multi-path scan keeps the plan O(1) in S —
    * the S-ness degrades to a file-listing, which every approach pays.
    * Row-identical to the union by construction: same files, same
    * rows, and the extracted ordinal equals the `lit(s0.ord)` the
    * union stamped (spec-pinned, incl. unsuffixed legacy basenames
    * and `_g`-bearing work paths). */
  private[graft] def segEmbeddings(spark: SparkSession,
      ss: Seq[Seg]): DataFrame = {
    val paths = ss.map(s0 => s"${s0.dir}/embeddings.parquet")
    // the ordinal parse FAILS HARD on a path the regex doesn't bind
    // (r13 advice): under orderBy(desc) a null ordinal sorts LAST, so
    // a layout drift (embeddings.parquet published as a single file,
    // an unexpected dir shape) would silently LOSE latest-wins for
    // that segment instead of erroring. Unreachable via the current
    // segs()/sealDelta/compactOnce lifecycle — this turns a silent-
    // wrong-winner failure mode into a loud one. The `(/|$)` tail
    // also accepts a single-FILE embeddings.parquet, where
    // input_file_name() has no trailing component.
    val ordStr = regexp_extract(input_file_name(),
      "/seg_([0-9]+)(?:_g[0-9]+)?/embeddings\\.parquet(/|$)", 1)
    spark.read.parquet(paths: _*)
      .withColumn("__ord",
        when(ordStr === "", raise_error(concat(
          lit("segEmbeddings: segment ordinal unparseable from "),
          input_file_name())))
          .otherwise(ordStr.cast("int")))
  }

  /** Engage the qid-bloom path prune only past this many segments
    * (conf `spark.graft.ann.qvPruneMinSegs`): the prune pays one
    * sidecar-scan job, which cannot beat just scanning a handful of
    * delta-sized segments — it exists for LSM-realistic S (hundreds
    * to thousands of sealed segments), where the un-pruned multi-path
    * scan opens every segment's files for a point lookup that most
    * segments provably cannot answer. */
  private def qvPruneMinSegs(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.ann.qvPruneMinSegs")
      .map(_.toInt).getOrElse(16)

  /** Drop segments whose `_idbloom` sidecar excludes EVERY batch qid
    * from a path list (r13 verdict item 4 — the bounded-batch arm's
    * multi-path scan listed and opened every segment's files even
    * when a segment's Bloom excluded the whole batch, guide §6 I/O).
    * ONE multi-path scan over the sidecars, ordinal from the same
    * rename-published basename discipline as [[segEmbeddings]]; the
    * per-segment probe runs EXECUTOR-side (a driver loop of
    * [[graft.model.IdFilters.bloomFromSidecar]] collects would pay S
    * driver jobs — the exact planning tax the multi-path scan
    * removed) and the driver receives one boolean per segment.
    * Sound by the Bloom no-false-negative contract: a dropped
    * segment provably holds none of the batch's ids, so the pruned
    * scan joins to the identical row set (spec-pinned bit-equal); a
    * false positive only keeps a segment. Segments without a sidecar
    * (legacy) are always kept; a sidecar with NO words is the empty
    * set (an empty segment) and prunes. */
  private[graft] def pruneSegsByIdBloom(spark: SparkSession,
      ss: Seq[Seg], qids: Array[Long]): Seq[Seg] = {
    import spark.implicits._
    if (qids.isEmpty || ss.size < qvPruneMinSegs(spark)) return ss
    val f = fs(spark, ss.head.dir)
    val withSidecar = ss.filter(s0 =>
      f.exists(new org.apache.hadoop.fs.Path(s"${s0.dir}/_idbloom")))
    if (withSidecar.isEmpty) return ss
    val qbc = spark.sparkContext.broadcast(qids)
    // same fail-hard ordinal parse as [[segEmbeddings]] (r13 advice):
    // without it an unbindable path decodes a null into a non-nullable
    // Int with an opaque error instead of naming the file
    val sidecarOrd = regexp_extract(input_file_name(),
      "/seg_([0-9]+)(?:_g[0-9]+)?/_idbloom(/|$)", 1)
    val hitOrds = spark.read
      .parquet(withSidecar.map(s0 => s"${s0.dir}/_idbloom"): _*)
      .withColumn("__ord",
        when(sidecarOrd === "", raise_error(concat(
          lit("pruneSegsByIdBloom: segment ordinal unparseable from "),
          input_file_name())))
          .otherwise(sidecarOrd.cast("int")))
      .select(col("__ord"), col("w"), col("mask"), col("nbits"),
        col("hashes"))
      .as[(Int, Long, Long, Int, Int)]
      .groupByKey(_._1)
      .mapGroups { (ord, it) =>
        val rows = it.toArray
        val bloom = graft.model.IdFilters.bloomFromWords(
          rows.map(r => (r._2, r._3)), rows.head._4, rows.head._5)
        (ord, qbc.value.exists(bloom.mayContain))
      }.collect().filter(_._2).map(_._1).toSet
    qbc.destroy()
    val sidecarOrds = withSidecar.map(_.ord).toSet
    ss.filter(s0 =>
      !sidecarOrds.contains(s0.ord) || hitOrds.contains(s0.ord))
  }

  /** Query-id vectors resolved latest-wins across the segments: the
    * newest segment holding the id supplies the row. ONE multi-path
    * scan + ONE broadcast join ([[segEmbeddings]]) — not a scan and a
    * join per segment — over the Bloom-pruned segment list
    * ([[pruneSegsByIdBloom]]: segments provably holding none of the
    * batch's ids never enter the scan's path list). */
  private[graft] def queryVecs(spark: SparkSession, ss: Seq[Seg],
      queries: DataFrame): Array[(Long, Array[Float], Double)] = {
    import graft.functions.VectorFunctions._
    import spark.implicits._
    if (ss.isEmpty) return Array.empty
    val qidArr = queries.select(col("query_id").cast("long"))
      .as[Long].collect()
    val kept = pruneSegsByIdBloom(spark, ss, qidArr)
    if (kept.isEmpty) return Array.empty
    val qids = qidArr.toSeq.toDF("vec_id")
    val all = segEmbeddings(spark, kept)
      .join(broadcast(qids), "vec_id")
      .select(col("vec_id"), col("embedding"), col("__ord").as("ord"))
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

  /** The S-leg union twin of [[queryVecs]]'s resolution — kept ONLY as
    * the spec/probe reference arm (bit-equality pin + isolation
    * timing); no serve path calls it. */
  private[graft] def queryVecsUnion(spark: SparkSession, ss: Seq[Seg],
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

  private def queryVecsCached(spark: SparkSession, work: String,
      ss: Seq[Seg], queries: DataFrame,
      key: String): Array[(Long, Array[Float], Double)] = {
    import spark.implicits._
    val qids = queries.select(col("query_id").cast("long"))
      .as[Long].collect().sorted
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(qids.mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    qvecCache.getOrElseUpdate(s"$work#$key#$digest") {
      queryVecDerivations.incrementAndGet()
      queryVecs(spark, ss,
        qids.toSeq.toDF("query_id"))
    }
  }

  /** Per-segment (rows, dim) — read from the `_centroid` sidecar (one
    * small-file read) when present, a count/dim scan otherwise; cached
    * per PATH (segment content is immutable per path), so repeated
    * compaction planning re-counts nothing. */
  private[graft] val segMetas =
    new graft.model.LruCache[String, (Long, Int)](4096)

  private[graft] def segMeta(spark: SparkSession,
      segDir: String): (Long, Int) =
    segMetas.getOrElseUpdate(segDir) {
      segMetaJobs.incrementAndGet()
      val cp = s"$segDir/_centroid"
      if (fs(spark, segDir).exists(new org.apache.hadoop.fs.Path(cp))) {
        val r = spark.read.parquet(cp).select("n", "cv").head
        (r.getLong(0), r.getSeq[Double](1).size)
      } else {
        val e = spark.read.parquet(s"$segDir/embeddings.parquet")
        val st = e.agg(count(lit(1)),
          first(size(col("embedding")))).head
        (st.getLong(0), if (st.isNullAt(1)) 0 else st.getInt(1))
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

  /** The per-segment beam candidates, `.distinct()`-ed: in normal
    * operation no two segments report the same (query, id, score) row
    * (latest-wins + shadows), but a crash between [[compactOnce]]'s
    * publish and cleanup can leave the merged segment AND its older
    * member both live — their shared rows duplicate byte-for-byte,
    * and the distinct collapses them so even that window serves
    * exactly. Candidate volume is |Q|·S·k — batch-bounded. */
  private def segCands(spark: SparkSession, work: String,
      queries: DataFrame, ef: Int, k: Int, extraExclude: Set[Long],
      budgetBytes: Long,
      routedFor: Option[Map[Int, Set[Long]]] = None): DataFrame = {
    import spark.implicits._
    val ss = segs(spark, work)
    val key = stateKey(spark, work)
    val st = excludeStateFor(spark, work, ss, key)
    val qrows = queryVecsCached(spark, work, ss, queries, key)
    // a ROUTED serve stages blobs only for the batch's working set —
    // segments some query routed to — never the full list
    val served = routedFor.fold(ss)(m =>
      ss.filter(s0 => m.getOrElse(s0.ord, Set.empty).nonEmpty))
    // blob discipline (r12 verdict item 2 — formerly
    // [[Hnsw.segmentImages]], which held ALL S images on the driver
    // at once and serialized them from it): indexes build concurrently
    // as disk artifacts, then the driver stages ONE image at a time
    // ([[Hnsw.imageBlobFor]]) and ships segment blob PATHS; each task
    // deserializes its own segment via [[Hnsw.ImageBlobCache]], so
    // peak driver residency is one budget-sized image regardless of S
    locally { // first-call concurrency only: staged blobs skip it
      import scala.collection.parallel.CollectionConverters._
      val toBuild = served.map(_.dir)
        .filterNot(Hnsw.hasImageBlob(_, budgetBytes))
      if (toBuild.nonEmpty)
        toBuild.par.foreach(d => Hnsw.indexFor(spark, d))
    }
    val blobs = served.map(s0 =>
      Hnsw.imageBlobFor(spark, s0.dir, budgetBytes))
    val cands: DataFrame = st.exact match {
      case Some(perOrd) =>
        val qbc = spark.sparkContext.broadcast(qrows)
        spark.sparkContext
          .parallelize(served.map(_.ord).zip(blobs),
            math.max(served.size, 1))
          .flatMap { case (ord, blob) =>
            val img = Hnsw.ImageBlobCache.get(blob)
            val ex = perOrd.getOrElse(ord, Set.empty) ++ extraExclude
            val want = routedFor.map(_.getOrElse(ord, Set.empty[Long]))
            qbc.value.iterator
              .filter(q => want.forall(_.contains(q._1)))
              .flatMap { case (qid, qv, qn) =>
                Hnsw.serveVec(img, qv, qn, selfId = qid, ef = ef, k = k,
                  exclude = ex).map { case (id, sc) => (qid, id, sc) }
              }
          }.toDF("query_id", "vec_id", "score")
      case None =>
        bloomCands(spark, served, blobs, qrows, st, ef, k, extraExclude,
          routedFor)
    }
    cands.distinct()
  }

  /** The PAST-THE-CAP serve: shadow ids exceed the driver cap, so no
    * task closure carries them as a Set. Beams serve UNEXCLUDED (plus
    * the caller's exact extra set) and emit their ENTIRE visited pool
    * in ONE pass — [[Hnsw.serveVec]]'s beam is ef-driven, `k` only
    * bounds the reported prefix, so the r13 widening ladder re-ran the
    * IDENTICAL beam per round just to read a deeper prefix of the same
    * sorted pool (r13 verdict item 3: per-round cost was a full
    * re-beam). Emitting the pool once subsumes every round: top-k live
    * of the full pool ≡ the ladder's terminal answer (a sorted prefix
    * with ≥ k live reports the same top-k live as the whole pool; an
    * exhausted prefix IS the pool) ≡ the exact arm's report-filtered
    * take — the bit-equality IncrementalIndexSpec pins. Every
    * candidate is classified through the broadcast Bloom map-side and
    * the driver verifies only flagged ids — per ord, against that
    * ord's actual newer-shadow tables, pushdown point lookups.
    * Driver candidate residency is |Q|·S·|pool| rows, pool bounded by
    * the ef-driven beam (ef·hops·degree) — batch-bounded, never
    * shadow-bounded, and no per-round broadcast/collect cycle. */
  private def bloomCands(spark: SparkSession, ss: Seq[Seg],
      blobs: Seq[String],
      qrows: Array[(Long, Array[Float], Double)], st: ExcludeState,
      ef: Int, k: Int, extraExclude: Set[Long],
      routedFor: Option[Map[Int, Set[Long]]] = None): DataFrame = {
    import spark.implicits._
    val bloom = st.bloom.get
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val qbc = spark.sparkContext.broadcast(qrows)
    // (ord, id) verdicts: dead-for-ord iff id ∈ a shadow NEWER than ord
    val verdicts =
      scala.collection.mutable.Map.empty[(Int, Long), Boolean]
    def verify(ord: Int, ids: Seq[Long]): Unit = {
      val unseen = ids.filterNot(id => verdicts.contains((ord, id)))
      if (unseen.nonEmpty) {
        val paths = st.verifyPaths.getOrElse(ord, Seq.empty)
        val dead =
          if (paths.isEmpty) Set.empty[Long]
          // an In-expression of |unseen| literals blows up the driver
          // plan (a pool pass can flag up to |Q|·|pool| ids) — switch
          // to the broadcast semi-join, the [[deriveShadowIdsSidecar]]
          // rule
          else if (unseen.size <= IsinPushdownCap)
            spark.read.parquet(paths: _*)
              .filter(col("vec_id").isin(unseen: _*))
              .select("vec_id").as[Long].collect().toSet
          else spark.read.parquet(paths: _*).select("vec_id")
            .join(broadcast(unseen.toDF("vec_id")), Seq("vec_id"),
              "left_semi")
            .as[Long].collect().toSet
        unseen.foreach(id => verdicts((ord, id)) = dead(id))
      }
    }
    val ordIdx = ss.map(_.ord).zipWithIndex.toMap
    val pairs: Seq[(Int, Set[Long])] =
      ss.map(s0 => s0.ord -> routedFor.fold(qrows.map(_._1).toSet)(
        _.getOrElse(s0.ord, Set.empty)))
        .filter(_._2.nonEmpty)
    val wantBc = spark.sparkContext.broadcast(pairs.toMap)
    val served = spark.sparkContext
      .parallelize(
        pairs.map { case (ord, _) => (ord, blobs(ordIdx(ord))) },
        math.max(pairs.size, 1))
      .flatMap { case (ord, blob) =>
        val img = Hnsw.ImageBlobCache.get(blob)
        val want = wantBc.value(ord)
        qbc.value.iterator.filter(q => want(q._1)).flatMap {
          case (qid, qv, qn) =>
            Hnsw.serveVec(img, qv, qn, selfId = qid, ef = ef,
              k = Int.MaxValue, exclude = extraExclude).map {
              case (id, sc) =>
                (ord, qid, id, sc, bloomBc.value.mayContain(id))
            }
        }
      }.collect()
    // everything below is driver-local data — the serve-scoped
    // broadcasts are dead and must not outlive the call
    wantBc.destroy()
    qbc.destroy()
    bloomBc.destroy()
    served.groupBy(_._1).foreach { case (ord, rows) =>
      verify(ord, rows.filter(_._5).map(_._3).distinct.toSeq)
    }
    served.groupBy(t => (t._1, t._2)).toSeq
      .flatMap { case ((ord, qid), rows) =>
        rows.sortBy(t => (-t._4, t._3))
          .filterNot(t => t._5 && verdicts((ord, t._3)))
          .take(k)
          .map(t => (qid, t._3, t._4))
      }.toDF("query_id", "vec_id", "score")
  }

  /** The LSM lifecycle × an UNBOUNDED query table — the serving-
    * matrix cell [[Hnsw.serveShardedQueryTableOnePass]] fills for the
    * residue layout, composed with shadows: all segments serve
    * CONCURRENTLY from blob-cached images, the query table fans out
    * on a `(segment, hash(query_id) mod P)` key (the query dimension
    * parallelizes; a hot segment never serializes its stream behind
    * one task), and NOTHING query-scale ever lands on the driver:
    *
    *   - query vectors resolve latest-wins IN-PLAN (segment union →
    *     keyed window), not via a driver collect;
    *   - shadow deadness is an equi-join against the correction-
    *     bounded `(vec_id, max shadow ord)` table — a candidate from
    *     segment i is dead iff a NEWER segment's shadow holds its id;
    *   - when the shadow total fits the driver cap the per-segment
    *     exact Sets ride the task closures and each beam backfills
    *     past them in ONE pass; past the cap the serve is STILL one
    *     pass — each beam emits its whole report-filtered visited
    *     pool (the beam is ef-driven; `k` only bounds the reported
    *     prefix), the deadness join classifies every candidate, and
    *     top-k live per (segment, query) falls out of one window.
    *     The r13 widening ladder re-ran the identical beam per round
    *     to read a deeper prefix of the same sorted pool; bit-equal
    *     by construction and spec-pinned.
    *
    * ROUTING (r12 verdict item 3) composes IN-PLAN: with a
    * non-degenerate `(maxRoutes, margin)` each query row computes its
    * adaptive route set ON THE EXECUTORS against the broadcast
    * segment-centroid table (segment-count-sized — the
    * [[Hnsw.serveShardedRoutedQueryTable]] pattern over the LSM
    * segment list) and fans only to its routed segments — |Q|·R
    * shuffle rows instead of |Q|·S. The default (maxRoutes ≥ S,
    * margin ≥ 2 — the cosine range) IS full fan-out: the adaptive
    * rule keeps every cell at that margin, and the code short-circuits
    * the centroid scoring for it; a wide-but-finite margin is
    * spec-pinned bit-equal to the full fan-out. Routing trims the
    * SEALED scatter only — freshness is structurally immune (shadows
    * exclude superseded ids from every served segment's report, and
    * the live delta below never rides a routed image).
    *
    * The LIVE DELTA (r12 verdict item 4) composes as the family's
    * exact arm, fully in-plan: delta rows (ingest-bounded) broadcast-
    * cross-join the resolved query vectors with the same rounded
    * cosine every serve reports, delta ids enter the deadness table at
    * +∞ ordinal (a delta row supersedes EVERY sealed copy — the
    * [[serveWithDelta]] contract), and the pool pass backfills any
    * beam whose report the delta superseded (deeper live candidates
    * are already in the emitted pool) — so the unbounded-table serve
    * answers FRESH without requiring a seal. With a delta present the
    * serve always takes the join-shaped deadness path: no delta id
    * ever lands in a driver Set or task closure.
    *
    * Bit-equal to [[serve]] on any bounded batch, and to
    * [[serveWithDelta]] with a delta (spec-pinned); returns the same
    * k-bounded gather shape as every serve in the family. */
  def serveQueryTable(spark: SparkSession, work: String,
      queries: DataFrame, ef: Int = 16, k: Int = 10,
      budgetBytes: Long = Hnsw.DefaultNodeBudget,
      qParts: Int = 0, maxRoutes: Int = Int.MaxValue,
      margin: Double = 2.0, delta: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val ss = segs(spark, work)
    val key = stateKey(spark, work)
    val st = excludeStateFor(spark, work, ss, key)
    if (ss.isEmpty)
      return Hnsw.shardedGather(spark, k,
        Seq.empty[(Long, Long, Double)]
          .toDF("query_id", "vec_id", "score"))
    locally { // first-call concurrency only: staged blobs skip it
      import scala.collection.parallel.CollectionConverters._
      val toBuild = ss.map(_.dir)
        .filterNot(Hnsw.hasImageBlob(_, budgetBytes))
      if (toBuild.nonEmpty)
        toBuild.par.foreach(d => Hnsw.indexFor(spark, d))
    }
    val blobs = ss.map(s0 => Hnsw.imageBlobFor(spark, s0.dir,
      budgetBytes))
    val ords = ss.map(_.ord)
    val p = math.max(1,
      if (qParts > 0) qParts
      else spark.sparkContext.defaultParallelism / math.max(ss.size, 1))
    // latest-wins query vectors, in-plan: newest segment holding the
    // id supplies the row — ONE multi-path scan + ONE join
    // ([[segEmbeddings]]), not a scan/join pair per segment: the
    // unbounded-table cell exists for large S, where an S-leg union
    // is O(S) plan analysis per serve
    val qids = queries.select(col("query_id").cast("long").as("vec_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("__ord").desc)
    // NO broadcast hint here, deliberately (r13 advice applied, then
    // retracted on round-14 review): this is the UNBOUNDED query-table
    // cell, and a forced broadcast(qids) caps it at Spark's hard
    // 8 GB / 512M-row relation limit — a scale failure on the one path
    // whose contract is that query volume never bounds the serve. The
    // hint also buys ~nothing: below the auto-broadcast threshold the
    // estimate already picks BroadcastHashJoin without it, and when a
    // SMALL table mis-estimates LARGE, AQE (enabled in GraftSession)
    // re-plans the join to broadcast at runtime from the actual
    // shuffle stats — so the only regime the hint CHANGES is a
    // genuinely huge table, where it converts a correct shuffle join
    // into a runtime broadcast failure. The bounded-batch twin
    // [[queryVecs]] keeps its hint: its qids are a driver-collected
    // array, bounded by contract before the join is ever built.
    val qv = segEmbeddings(spark, ss)
      .join(qids, "vec_id")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<float>").as("qv"))
      .as[(Long, Array[Float])]
    // per-query route sets, executor-side: the broadcast is the
    // segment CENTROID table plus the ord → fan-index map — both
    // segment-count-sized, never an image. The degenerate
    // (maxRoutes ≥ S, margin ≥ 2) serve skips the scoring entirely:
    // the adaptive rule keeps every cell there by definition.
    val routeAll = maxRoutes >= ss.size && margin >= 2.0
    val centsBc = spark.sparkContext.broadcast(
      if (routeAll) Array.empty[(Long, Array[Double], Double)]
      else centroidsFor(spark, work, ss, key))
    val ordIdxBc = spark.sparkContext.broadcast(
      ords.zipWithIndex.map { case (o, i) => (o.toLong, i) }.toMap)
    def fanned = qv.flatMap { case (qid, emb) =>
      var s = 0.0
      var i = 0
      while (i < emb.length) {
        s += emb(i).toDouble * emb(i).toDouble; i += 1
      }
      val qn = math.sqrt(s)
      val sis: Iterator[Int] =
        if (routeAll) ords.indices.iterator
        else Hnsw.routeCellsAdaptive(centsBc.value, emb, qn,
          maxRoutes, margin).iterator.map(ordIdxBc.value)
      sis.map(si => (si, qid, emb, qn))
    }
    val ordsArr = ords.toArray
    val blobsArr = blobs.toArray
    def serveRound(fan: org.apache.spark.sql.Dataset[
        (Int, Long, Array[Float], Double)], kk: Int,
        exact: Option[Map[Int, Set[Long]]]): DataFrame = {
      fan.groupByKey(t =>
          (t._1, (((t._2 * 0x9E3779B97F4A7C15L) >>> 33) % p).toInt))
        .flatMapGroups { (gk, it) =>
          val img = Hnsw.ImageBlobCache.get(blobsArr(gk._1))
          val ord = ordsArr(gk._1)
          val ex = exact.fold(Set.empty[Long])(_.getOrElse(ord,
            Set.empty))
          it.flatMap { case (_, qid, emb, qn) =>
            Hnsw.serveVec(img, emb, qn, selfId = qid,
              ef = ef, k = kk, exclude = ex)
              .map { case (id, sc) => (gk._1, ord, qid, id, sc) }
          }
        }.toDF("__segidx", "__segord", "query_id", "vec_id", "score")
    }
    val cands: DataFrame = (st.exact, delta) match {
      case (Some(perOrd), None) =>
        // one pass: beams backfill past the bounded exact excludes
        serveRound(fanned, k, Some(perOrd))
          .select("query_id", "vec_id", "score")
      case _ =>
        // correction-bounded deadness table: id → newest shadow ord;
        // a candidate from segment i is dead iff that ord exceeds i.
        // Live-delta ids enter at +∞ ordinal: a delta row supersedes
        // every sealed copy, and the join keeps the ids off the
        // driver entirely (a delta FORCES this path even when the
        // shadow total fits the cap).
        //
        // ONE pool pass, no widening loop (r13 verdict item 3):
        // [[Hnsw.serveVec]]'s beam is ef-driven — `k` only bounds the
        // reported prefix of the SAME sorted visited pool — so the r13
        // ladder re-ran the identical beam per round (plus a shuffle,
        // a localCheckpoint and a driver count) to read a deeper
        // prefix. Each beam now emits its whole report-filtered pool
        // once, the deadness join classifies every candidate, and
        // top-k LIVE per (segment, query) is exactly the ladder's
        // terminal answer (a sorted prefix holding ≥ k live reports
        // the same top-k live as the full pool; an exhausted prefix
        // IS the pool) — and exactly the exact arm's report-filtered
        // take, the bit-equality IncrementalIndexSpec pins. Shuffle
        // volume is |Q|·S·|pool| SMALL rows (pool is ef·hop-bounded),
        // against the ladder's repeated |Q|·S·k' rows PLUS repeated
        // beam CPU per round.
        val shadowTbls = ss.flatMap(s0 =>
          shadowPathOf(spark, work, s0.ord).map(pp =>
            spark.read.parquet(pp).select(col("vec_id"),
              lit(s0.ord.toLong).as("__sord"))))
        val deltaTbl = delta.map(_.select(col("vec_id"),
          lit(Long.MaxValue).as("__sord")))
        val maxShadow = (shadowTbls ++ deltaTbl)
          .reduceOption(_.unionByName(_))
          .getOrElse(Seq.empty[(Long, Long)].toDF("vec_id", "__sord"))
          .groupBy("vec_id").agg(max("__sord").as("__maxsord"))
        val liveW = org.apache.spark.sql.expressions.Window
          .partitionBy("__segidx", "query_id")
          .orderBy(desc("score"), col("vec_id"))
        serveRound(fanned, Int.MaxValue, None)
          .join(maxShadow, Seq("vec_id"), "left_outer")
          .filter(!coalesce(col("__maxsord") > col("__segord"),
            lit(false)))
          .withColumn("__rk", row_number().over(liveW))
          .filter(col("__rk") <= k)
          .select("query_id", "vec_id", "score")
    }
    // the live-delta exact arm: the ingest-bounded delta BROADCASTS
    // against the in-plan resolved query table (the unbounded axis
    // streams; the bounded one ships) — same rounded cosine, same
    // self-exclusion as [[serveWithDelta]]'s bounded-batch arm
    val deltaArm = delta.map { d =>
      val qvn = qv.toDF("query_id", "qv")
        .withColumn("qn", l2norm(col("qv")))
      val dd = d.select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
        .withColumn("nrm", l2norm(col("embedding")))
      qvn.crossJoin(broadcast(dd))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("score",
          round(cosinePrenormed(dot(col("embedding"), col("qv")),
            col("nrm"), col("qn")), 6))
        .select("query_id", "vec_id", "score")
    }
    val all = deltaArm.fold(cands)(da => cands.unionByName(da))
    Hnsw.shardedGather(spark, k, all.distinct())
  }

  /** [[serve]] with the UN-SEALED live delta composed in: the delta
    * is scanned exactly (ingest-bounded), its ids shadow every sealed
    * segment (latest-wins), both arms merge in the one k-bounded
    * gather — [[Hnsw.serveShardedIngestDelta]]'s contract over the
    * incremental layout.
    *
    * The delta-id exclusion follows the [[graft.model.IdFilters]]
    * ladder (r12 verdict item 5 — this was the family's last
    * documented driver-Set exception): up to the driver cap the ids
    * ride the task closures as an exact Set and every sealed beam
    * backfills past them in one pass (the delta-bounded fast path the
    * streaming loop serves at interactive latency); PAST the cap no
    * delta id ever lands on the driver — the serve routes through
    * [[serveQueryTable]]'s join-shaped deadness table, where delta
    * ids enter at +∞ ordinal and widening rounds backfill superseded
    * reports. Both arms are spec-pinned equal across a planted cap. */
  def serveWithDelta(spark: SparkSession, work: String, delta: DataFrame,
      queries: DataFrame, ef: Int = 16, k: Int = 10,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val deltaIdsDf = delta.select(col("vec_id"))
    val nDelta = deltaIdsDf.count()
    if (nDelta > graft.model.IdFilters.driverCap(spark))
      return serveQueryTable(spark, work, queries, ef, k, budgetBytes,
        delta = Some(delta))
    val deltaIds = deltaIdsDf.as[Long].collect().toSet
    val sealedCands = segCands(spark, work, queries, ef, k, deltaIds,
      budgetBytes)
    val qrows = queryVecsCached(spark, work, segs(spark, work), queries,
      stateKey(spark, work))
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

  /** Per-work-state segment centroids — (ord, cv, cn) from the
    * `_centroid` sidecars, segment-count-sized, memoized per state
    * key; a legacy segment without a sidecar derives its centroid
    * once (its own rows, never a corpus pass). */
  private[graft] val centroidCache = new graft.model.LruCache[
    String, Array[(Long, Array[Double], Double)]](64)

  private def centroidsFor(spark: SparkSession, work: String,
      ss: Seq[Seg], key: String): Array[(Long, Array[Double], Double)] =
    centroidCache.getOrElseUpdate(s"$work#$key") {
      import spark.implicits._
      ss.map { s0 =>
        val cp = s"${s0.dir}/_centroid"
        val (cv, cn) =
          if (fs(spark, work).exists(new org.apache.hadoop.fs.Path(cp))) {
            val r = spark.read.parquet(cp).select("cv", "cn").head
            (r.getSeq[Double](0).toArray, r.getDouble(1))
          } else {
            val rows = spark.read
              .parquet(s"${s0.dir}/embeddings.parquet")
              .select(posexplode(col("embedding").cast("array<double>")))
              .groupBy("pos").agg(avg("col").as("v"))
              .orderBy("pos").select("v").as[Double].collect()
            (rows, math.sqrt(rows.map(x => x * x).sum))
          }
        (s0.ord.toLong, cv, cn)
      }.toArray
    }

  /** ROUTED LSM serving — [[Hnsw.routeCellsAdaptive]]'s
    * confidence-derived scatter composed onto the segment lifecycle:
    * each query serves only the segments whose centroid similarity is
    * within `margin` of its best (at least the top-1, at most
    * `maxRoutes`), and the rest of the serve — shadow excludes,
    * k-bounded gather, image budget — is [[serve]] unchanged. On a
    * CLUSTERED ingest stream (each seal a topical burst, the shape
    * real corpora arrive in) a confident query touches R ≪ S segment
    * images; on an unstructured stream (residue-split init segments
    * whose centroids all sit near the global mean) the scores bunch
    * within the margin and the query WIDENS ITSELF back toward full
    * fan-out — low centroid confidence degrades to [[serve]]
    * automatically, per query, not by a mode switch. `maxRoutes ≥ S`
    * with `margin ≥ 2` (the cosine range) is exactly [[serve]]
    * (spec-pinned). Staleness note: skipping a segment can only cost
    * RECALL, never freshness — the shadow rule excludes superseded
    * ids from any served segment's report regardless of which
    * segments the query reached. Images materialize only for the
    * batch's routed working set. */
  /** The adaptive route plan: query id → the segment ords it serves.
    * Exposed for probes (mean-segments-served gauges); [[serveRouted]]
    * consumes it verbatim. */
  private[graft] def routePlan(spark: SparkSession, work: String,
      queries: DataFrame, maxRoutes: Int,
      margin: Double): Map[Long, Seq[Int]] = {
    val ss = segs(spark, work)
    val key = stateKey(spark, work)
    val cents = centroidsFor(spark, work, ss, key)
    val qrows = queryVecsCached(spark, work, ss, queries, key)
    qrows.map { case (qid, qv, qn) =>
      qid -> Hnsw.routeCellsAdaptive(cents, qv, qn, maxRoutes, margin)
        .map(_.toInt)
    }.toMap
  }

  def serveRouted(spark: SparkSession, work: String, queries: DataFrame,
      maxRoutes: Int, margin: Double, ef: Int = 16, k: Int = 10,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): DataFrame = {
    val routed: Map[Int, Set[Long]] =
      routePlan(spark, work, queries, maxRoutes, margin).toSeq
        .flatMap { case (qid, ords) => ords.map(o => (o, qid)) }
        .groupBy(_._1).map { case (o, xs) => o -> xs.map(_._2).toSet }
    Hnsw.shardedGather(spark, k,
      segCands(spark, work, queries, ef, k, Set.empty, budgetBytes,
        Some(routed)))
  }

  /** [[serveRouted]] with the UN-SEALED live delta composed in — the
    * streaming loop's routed serve: the sealed arm scatters only to
    * each query's routed segments (adaptive margin), the delta arm is
    * scanned exactly (ingest-bounded — a live correction or arrival
    * can never be missed by routing, because it never rides a routed
    * image at all), delta ids shadow every routed report, and both
    * arms merge in the one k-bounded gather. Wide margin at full
    * maxRoutes degenerates to [[serveWithDelta]] (spec-pinned).
    * Delta-id exclusion rides the same [[graft.model.IdFilters]]
    * ladder as [[serveWithDelta]]: past the driver cap the serve
    * routes through [[serveQueryTable]]'s in-plan deadness table with
    * the SAME adaptive routing — no delta id on the driver. */
  def serveRoutedWithDelta(spark: SparkSession, work: String,
      delta: DataFrame, queries: DataFrame, maxRoutes: Int,
      margin: Double, ef: Int = 16, k: Int = 10,
      budgetBytes: Long = Hnsw.DefaultNodeBudget): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val deltaIdsDf = delta.select(col("vec_id"))
    if (deltaIdsDf.count() > graft.model.IdFilters.driverCap(spark))
      return serveQueryTable(spark, work, queries, ef, k, budgetBytes,
        maxRoutes = maxRoutes, margin = margin, delta = Some(delta))
    val deltaIds = deltaIdsDf.as[Long].collect().toSet
    val routed: Map[Int, Set[Long]] =
      routePlan(spark, work, queries, maxRoutes, margin).toSeq
        .flatMap { case (qid, ords) => ords.map(o => (o, qid)) }
        .groupBy(_._1).map { case (o, xs) => o -> xs.map(_._2).toSet }
    val sealedCands = segCands(spark, work, queries, ef, k, deltaIds,
      budgetBytes, Some(routed))
    val qrows = queryVecsCached(spark, work, segs(spark, work), queries,
      stateKey(spark, work))
    val qv = qrows.toSeq.toDF("query_id", "qv", "qn")
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
    // (rows, dim) from the per-path [[segMeta]] cache (sidecar-read or
    // one scan, ever, per immutable segment path) — repeated
    // compaction planning over an unchanged tier re-counts nothing
    val metas = ss.map(s0 => s0.ord -> segMeta(spark, s0.dir)).toMap
    val counts = metas.view.mapValues(_._1).toMap
    val dim = ss.iterator.map(s0 => metas(s0.ord)._2)
      .collectFirst { case d if d > 0 => d }.getOrElse(0)
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
      writeSidecars(spark, staged)
      val mergedShadow = shadowOf(spark, work, older.ord)
        .unionByName(shadowOf(spark, work, newer.ord)).distinct()
      val stagedShadow = s"$work/_staged_shadow_${newer.ord}.parquet"
      mergedShadow.write.mode("overwrite").parquet(stagedShadow)
      // PUBLISH FIRST, DELETE LAST — every intermediate state is
      // servable. Fresh paths (gen+1 on BOTH the segment and its
      // shadow): the per-dir index/image caches must never see new
      // bytes behind an old identity, and rename-to-fresh never
      // collides with the superseded file. Generation parses from the
      // BASENAME (a work path containing "_g" must not leak in).
      // Crash windows, in order: after the segment publish the old
      // newer-gen dir is hidden by [[segs]]'s max-generation dedupe
      // and the still-live older segment's rows duplicate the merged
      // copy byte-for-byte — the serve's candidate distinct collapses
      // them; after the shadow publish the merged (union) shadow
      // over-excludes only ids the merged segment itself re-reports;
      // the trailing deletes only remove paths nothing resolves
      // anymore.
      val gen = parseSegName(
        new org.apache.hadoop.fs.Path(newer.dir).getName)
        .map(_._2).getOrElse(0)
      val mergedDir =
        s"$work/segments/seg_${newer.ord}_g${gen + 1}"
      val f = fs(spark, work)
      renameOrDie(f, staged, mergedDir)
      // the shadow root only pre-exists if some seal wrote a shadow;
      // a rename into a missing parent fails on HDFS-style stores
      // (the local-FS copy fallback creates parents and masked this)
      f.mkdirs(new org.apache.hadoop.fs.Path(s"$work/shadow"))
      renameOrDie(f, stagedShadow,
        s"$work/shadow/seg_${newer.ord}_g${gen + 1}.parquet")
      f.delete(new org.apache.hadoop.fs.Path(older.dir), true)
      f.delete(new org.apache.hadoop.fs.Path(newer.dir), true)
      // superseded shadows: every generation of the older ordinal,
      // and the newer ordinal's files BELOW the published generation
      val shadowRoot = new org.apache.hadoop.fs.Path(s"$work/shadow")
      if (f.exists(shadowRoot))
        f.listStatus(shadowRoot).map(_.getPath.getName).foreach { n =>
          parseShadowName(n).foreach { case (o, g) =>
            if (o == older.ord || (o == newer.ord && g <= gen))
              f.delete(
                new org.apache.hadoop.fs.Path(s"$work/shadow/$n"), true)
          }
        }
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

  private def workDirFor(spark: SparkSession, dir: String): String =
    workDirs.computeIfAbsent(dir, { _ =>
      val w = java.nio.file.Files
        .createTempDirectory("graft_incr_idx").toString
      val e = Tables.embeddings(spark, dir)
      val cut = Ann.deltaCutoff(Search.embNormed(spark, dir))
      val sealedDir = Hnsw.sealedDirFor(spark, dir)
      // The planted 4-segment head IS the sealed residue-4 layout:
      // [[initSegments]]' budget math (head image / 4, and
      // [[Hnsw.imageBytesPerVec]] is divisible by 4) derives S = 4 and
      // splits on `vec_id mod 4` — row-for-row the same segments
      // [[Hnsw.shardDirsFor]](sealedDir, 4) lays out for
      // `q_hnsw_sharded_delta`. So reuse that layout verbatim: copy
      // each shard's rows into the work dir (the LSM owns its files —
      // compaction deletes and rewrites them) and SHARE the built
      // hierarchy ([[Hnsw.shareIndex]]), so one bench/verify session
      // pays ONE set of sealed-head NN-Descent builds across the
      // lifecycle rows and the sharded-delta row instead of two (the
      // r12 bench-wall item). Answers are untouched by construction:
      // same rows per segment, and every index artifact is a
      // deterministic content derivation.
      val shards = Hnsw.shardDirsFor(spark, sealedDir, 4)
      val f = fs(spark, w)
      // the four shard builds are independent jobs — submit them
      // concurrently like every other S-way build here (sequential
      // submission serialized ~4 one-time index trains behind each
      // other in the r13 first cut); the copy+sidecar leg rides the
      // same parallel loop
      locally {
        import scala.collection.parallel.CollectionConverters._
        shards.zipWithIndex.par.foreach { case (sd, i) =>
          val d = s"$w/segments/seg_${i}_g0"
          f.mkdirs(new org.apache.hadoop.fs.Path(d))
          org.apache.hadoop.fs.FileUtil.copy(f,
            new org.apache.hadoop.fs.Path(s"$sd/embeddings.parquet"),
            f, new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet"),
            false, spark.sparkContext.hadoopConfiguration)
          writeSidecars(spark, d)
          Hnsw.shareIndex(spark, d, sd)
        }
      }
      val delta = e.crossJoin(broadcast(cut))
        .filter(col("vec_id") >= col("cutoff"))
        .select("vec_id", "embedding")
      sealDelta(spark, w, delta)
      w
    })

  def qHnswIncr(spark: SparkSession, dir: String): DataFrame =
    serve(spark, workDirFor(spark, dir),
      spark.range(8).toDF("query_id"), ef = 16, k = 5)
      .orderBy("query_id", "rank")

  /** The ROUTED serve over the same lifecycle as a registry row:
    * adaptive margin 0.05, maxRoutes 2 — each query keeps only the
    * segments its centroid confidence admits (widening itself where
    * the scores bunch). Golden oracle like every trained-graph
    * serve; IncrementalIndexSpec pins the full-fan-out degeneration
    * and the planted clustered-stream routing behavior. */
  def qHnswIncrRouted(spark: SparkSession, dir: String): DataFrame =
    serveRouted(spark, workDirFor(spark, dir),
      spark.range(8).toDF("query_id"), maxRoutes = 2, margin = 0.05,
      ef = 16, k = 5)
      .orderBy("query_id", "rank")

  /** The unbounded-query-table serve over the same lifecycle as a
    * registry row: the 8-query batch runs through the fully in-plan
    * path (fan-out key, join-verified shadows, k-bounded gather) —
    * IncrementalIndexSpec pins it bit-equal to [[serve]] on any batch,
    * in both the exact and the past-the-cap widening mode. Golden
    * oracle like every trained-graph serve. */
  def qHnswIncrTable(spark: SparkSession, dir: String): DataFrame =
    serveQueryTable(spark, workDirFor(spark, dir),
      spark.range(8).toDF("query_id"), ef = 16, k = 5)
      .orderBy("query_id", "rank")

  /** ROUTING × the unbounded-query-table serve as a registry row (r12
    * verdict item 3 closed): the same lifecycle and the same adaptive
    * parameters as [[qHnswIncrRouted]] (margin 0.05, maxRoutes 2),
    * but the route set is computed IN-PLAN on the executors against
    * the broadcast `_centroid` table and the fan-out is |Q|·R rows
    * instead of |Q|·S. Spec-pinned bit-equal to [[serveRouted]] on
    * any bounded batch; golden oracle like every trained-graph
    * serve. */
  def qHnswIncrTableRouted(spark: SparkSession, dir: String): DataFrame =
    serveQueryTable(spark, workDirFor(spark, dir),
      spark.range(8).toDF("query_id"), ef = 16, k = 5,
      maxRoutes = 2, margin = 0.05)
      .orderBy("query_id", "rank")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hnsw_incr" -> (qHnswIncr _),
    "q_hnsw_incr_routed" -> (qHnswIncrRouted _),
    "q_hnsw_incr_table" -> (qHnswIncrTable _),
    "q_hnsw_incr_table_routed" -> (qHnswIncrTableRouted _)
  )

  val oracles: Map[String, String] = Map(
    "q_hnsw_incr" ->
      s"""SELECT * FROM
         |read_parquet('$fixturesDir/hnsw_incr_sf0.01.parquet/*.parquet')
         |ORDER BY query_id, rank""".stripMargin,
    "q_hnsw_incr_routed" ->
      s"""SELECT * FROM
         |read_parquet(
         |  '$fixturesDir/hnsw_incr_routed_sf0.01.parquet/*.parquet')
         |ORDER BY query_id, rank""".stripMargin,
    "q_hnsw_incr_table" ->
      s"""SELECT * FROM
         |read_parquet(
         |  '$fixturesDir/hnsw_incr_table_sf0.01.parquet/*.parquet')
         |ORDER BY query_id, rank""".stripMargin,
    "q_hnsw_incr_table_routed" ->
      s"""SELECT * FROM
         |read_parquet(
         |  '$fixturesDir/hnsw_incr_table_routed_sf0.01.parquet/*.parquet')
         |ORDER BY query_id, rank""".stripMargin
  )
}
