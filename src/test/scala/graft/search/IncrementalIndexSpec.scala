package graft
package search

import org.apache.spark.sql.functions._

import graft.operators.{Hnsw, IncrementalIndex => II, Search}

/** The LSM segment lifecycle ([[IncrementalIndex]]): seal-delta-as-
  * segment, shadow-based corrections, size-tiered adjacent compaction.
  * Pins the load-bearing claims: the seeded layout partitions the
  * corpus and serves as the exact reference merge; a seal builds ONLY
  * delta-sized data and touches no sealed file; a correction is
  * reported once, from the newest row, at the fresh score — across
  * serve, seal, and compaction; compaction preserves the latest-wins
  * corpus, physically drops superseded rows, and rewrites nothing but
  * the merged pair.
  */
/** Shared lifecycle fixture + reference merge for the two LSM suites
  * ([[IncrementalIndexSpec]]: lifecycle mutations;
  * [[IncrementalServeSpec]]: the serve-mode equality pins). Two
  * suites, not one, so the parallel test groups can overlap them —
  * the single 15-test suite was the grouped wall's floor. */
trait IncrementalFixture extends SparkSpec {

  /** Driver-side reference merge over the CURRENT segments with the
    * lifecycle's own shadow excludes — what the distributed serve must
    * equal bit-for-bit. */
  protected def referenceServe(work: String, qids: Seq[Long], ef: Int,
      k: Int): Map[Long, Seq[(Long, Double)]] = {
    import spark.implicits._
    val ss = II.segs(spark, work)
    // excludes derived here INDEPENDENTLY of the production path
    // (direct shadow-file collects — the exact semantics), so the
    // memoized/capped/Bloom serve is checked against first principles
    val shadows: Seq[(Int, Set[Long])] = ss.map(s0 =>
      s0.ord -> II.shadowOf(spark, work, s0.ord)
        .select("vec_id").as[Long].collect().toSet)
    val excl: Map[Int, Set[Long]] = ss.map(s0 =>
      s0.ord -> shadows.filter(_._1 > s0.ord).map(_._2)
        .fold(Set.empty[Long])(_ ++ _)).toMap
    val imgs = ss.map(s0 => (s0.ord, Hnsw.imageFor(spark, s0.dir)))
    val qvs = II.queryVecs(spark, ss,
      spark.createDataFrame(
        spark.sparkContext.parallelize(qids.map(org.apache.spark.sql.Row(_))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("query_id",
            org.apache.spark.sql.types.LongType))))
    )
    qvs.map { case (qid, qv, qn) =>
      qid -> imgs.flatMap { case (ord, img) =>
        Hnsw.serveVec(img, qv, qn, selfId = qid, ef = ef, k = k,
          exclude = excl(ord))
      }.sortBy { case (id, sc) => (-sc, id) }.take(k)
    }.toMap
  }

  protected def assertServeMatchesReference(work: String, qids: Seq[Long],
      ef: Int = 16, k: Int = 5): Unit = {
    import spark.implicits._
    val out = II.serve(spark, work,
      qids.toDF("query_id"), ef = ef, k = k).collect()
    val ref = referenceServe(work, qids, ef, k)
    qids.foreach { qid =>
      val got = out.filter(_.getLong(0) == qid).sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(got === ref(qid), s"query $qid diverged from reference")
    }
  }

  /** Fresh lifecycle seeded from sf0.001 at a planted 3-segment
    * budget. The pristine init layout is BUILT ONCE per JVM and
    * file-copied per test (r13 verdict round-14 item 1 — every test
    * paid its own initSegments, the suite's dominant fixture cost):
    * initSegments is deterministic, so the copy is byte-identical to
    * a fresh build, and each test still mutates its own private
    * copy. The copied init segments alias the pristine's built HNSW
    * hierarchies ([[Hnsw.shareIndex]] — content-identical by copy,
    * the exact sharing [[II.workDirFor]] ships in production). */
  protected def freshWork(): (String, Long) = {
    val (src, budget) = IncrementalIndexSpec.pristine(spark, sfDir)
    val work = java.nio.file.Files
      .createTempDirectory("graft_incr_spec").toString
    IncrementalIndexSpec.copyDir(
      java.nio.file.Paths.get(src), java.nio.file.Paths.get(work))
    II.segs(spark, work).foreach { s0 =>
      val name = new org.apache.hadoop.fs.Path(s0.dir).getName
      Hnsw.shareIndex(spark, s0.dir, s"$src/segments/$name")
    }
    (work, budget)
  }

  protected def fs0(work: String) =
    new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The lifecycle's logical corpus: latest-wins (vec_id → newest
    * segment's row), as (id, first embedding component) pairs. */
  protected def latestWins(work: String): Map[Long, Float] =
    II.segs(spark, work).flatMap { s0 =>
      spark.read.parquet(s"${s0.dir}/embeddings.parquet")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), s0.ord, r.getSeq[Float](1).head))
    }.groupBy(_._1).map { case (id, rows) =>
      id -> rows.maxBy(_._2)._3
    }
}

/** The LSM lifecycle mutations: init/seal/compact/crash/parsing. */
class IncrementalIndexSpec extends IncrementalFixture {

  test("init partitions the corpus and the serve equals the exact " +
      "reference merge") {
    import spark.implicits._
    val (work, _) = freshWork()
    val ss = II.segs(spark, work)
    assert(ss.size >= 3)
    val all = Search.embNormed(spark, sfDir)
      .select("vec_id").as[Long].collect().toSet
    val parts = ss.map(s0 => spark.read
      .parquet(s"${s0.dir}/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet)
    assert(parts.map(_.size).sum === all.size)
    assert(parts.reduce(_ ++ _) === all)
    assertServeMatchesReference(work, Seq(0L, 1L, 2L, 7L))
  }

  test("sealDelta: the new segment is exactly the delta, no sealed " +
      "file is touched, and appended vectors become findable") {
    import spark.implicits._
    val (work, _) = freshWork()
    val before = II.segs(spark, work).map { s0 =>
      s0.dir -> fs0(work).getFileStatus(
        new org.apache.hadoop.fs.Path(s"${s0.dir}/embeddings.parquet"))
        .getModificationTime
    }
    // append-only delta: 20 near-clones of corpus vectors, fresh ids
    val base = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0) + 100000L,
        r.getSeq[Float](1).toArray.map(x => x * 0.5f)))
    val delta = base.toSeq.toDF("vec_id", "embedding")
    val sealedSeg = II.sealDelta(spark, work, delta)
    assert(sealedSeg.nonEmpty)
    val segRows = spark.read
      .parquet(s"${sealedSeg.get.dir}/embeddings.parquet")
    assert(segRows.count() === 20L, "seal must build delta-sized data")
    // append-only ⇒ empty shadow
    assert(II.shadowOf(spark, work, sealedSeg.get.ord).count() === 0L)
    // no sealed file rewritten
    before.foreach { case (d, mtime) =>
      assert(fs0(work).getFileStatus(new org.apache.hadoop.fs.Path(
        s"$d/embeddings.parquet")).getModificationTime === mtime,
        s"seal rewrote sealed segment $d")
    }
    // a half-scaled clone has cosine 1.0 to its source: query its
    // source id, the clone must appear (rank 1, score 1.0)
    val out = II.serve(spark, work, Seq(0L, 7L).toDF("query_id"),
      ef = 16, k = 5).collect()
    Seq(0L, 7L).foreach { qid =>
      val top = out.filter(r => r.getLong(0) == qid && r.getLong(1) == 1L)
      assert(top.head.getLong(2) === qid + 100000L,
        s"query $qid: sealed clone not served at rank 1")
      assert(top.head.getDouble(3) === 1.0)
    }
    assertServeMatchesReference(work, Seq(0L, 7L, 11L))
  }

  test("a correction shadows the stale row: reported once, from the " +
      "newest segment, at the fresh score — and the query vector " +
      "itself resolves latest-wins") {
    import spark.implicits._
    val (work, _) = freshWork()
    // correct vec_id 5: re-deliver it as the near-clone of vec 0's
    // direction (scaled), so post-seal kNN(0) must place id 5 at
    // rank 1 with score 1.0 — impossible from the stale row unless
    // the shadow rule serves the NEW embedding only
    val v0 = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") === 0).select("embedding").head
      .getSeq[Float](0).toArray
    val delta = Seq((5L, v0.map(_ * 0.25f)))
      .toDF("vec_id", "embedding")
    val seg = II.sealDelta(spark, work, delta)
    assert(seg.nonEmpty)
    assert(II.shadowOf(spark, work, seg.get.ord)
      .as[Long].collect().toSeq === Seq(5L),
      "the correction must be recorded as a shadow")
    val out = II.serve(spark, work, Seq(0L, 5L).toDF("query_id"),
      ef = 16, k = 5).collect()
    // reported once, fresh score, rank 1 for query 0
    val for0 = out.filter(_.getLong(0) == 0L)
    assert(for0.count(_.getLong(2) == 5L) === 1,
      "corrected id must be reported exactly once")
    val top0 = for0.filter(_.getLong(1) == 1L).head
    assert(top0.getLong(2) === 5L)
    assert(top0.getDouble(3) === 1.0,
      "the corrected row's score must come from the NEW embedding")
    // query 5's own vector resolves latest-wins: its top hit is id 0
    // at score 1.0 (the new direction), not its old neighborhood
    val top5 = out.filter(r => r.getLong(0) == 5L && r.getLong(1) == 1L)
    assert(top5.head.getLong(2) === 0L)
    assert(top5.head.getDouble(3) === 1.0)
    assertServeMatchesReference(work, Seq(0L, 5L, 9L))
  }

  test("compactOnce merges the smallest adjacent pair latest-wins, " +
      "drops superseded rows, rewrites nothing else, and the serve " +
      "still matches the reference") {
    import spark.implicits._
    val (work, budget) = freshWork()
    // two seals: a correction of id 5, then a correction of id 5 AGAIN
    // plus a fresh id — so shadows exist at two levels
    val v0 = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") === 0).select("embedding").head
      .getSeq[Float](0).toArray
    II.sealDelta(spark, work,
      Seq((5L, v0.map(_ * 0.25f))).toDF("vec_id", "embedding"))
    II.sealDelta(spark, work,
      Seq((5L, v0.map(_ * -0.25f)), (200000L, v0.map(_ * 0.125f)))
        .toDF("vec_id", "embedding"))
    val ssBefore = II.segs(spark, work)
    val idsBefore = latestWins(work)
    val untouched = ssBefore.dropRight(2).map { s0 =>
      s0.dir -> fs0(work).getFileStatus(
        new org.apache.hadoop.fs.Path(s"${s0.dir}/embeddings.parquet"))
        .getModificationTime
    }
    // the two seal segments (1 and 2 rows) are the smallest adjacent
    // pair under any sane budget
    val merged = II.compactOnce(spark, work, budget)
    assert(merged.nonEmpty)
    val (oldOrd, newOrd) = merged.get
    assert(oldOrd === ssBefore(ssBefore.size - 2).ord)
    assert(newOrd === ssBefore.last.ord)
    val ssAfter = II.segs(spark, work)
    assert(ssAfter.size === ssBefore.size - 1)
    // latest-wins corpus preserved, superseded rows physically gone
    assert(latestWins(work) === idsBefore)
    val mergedDir = ssAfter.find(_.ord == newOrd).get.dir
    assert(mergedDir !== ssBefore.last.dir,
      "compaction must publish the merged segment under a FRESH path " +
        "(per-dir index/image caches key on the path)")
    val mergedRows = spark.read.parquet(s"$mergedDir/embeddings.parquet")
    assert(mergedRows.filter(col("vec_id") === 5L).count() === 1L,
      "compaction must keep exactly the newest row for a corrected id")
    // the merged pair's winner: the SECOND correction (negative dir)
    val kept = mergedRows.filter(col("vec_id") === 5L)
      .select("embedding").head.getSeq[Float](0)
    assert(kept.head === -0.25f * v0.head,
      "merged row must be the newer correction")
    // untouched segments untouched
    untouched.foreach { case (d, mtime) =>
      assert(fs0(work).getFileStatus(new org.apache.hadoop.fs.Path(
        s"$d/embeddings.parquet")).getModificationTime === mtime,
        s"compaction rewrote unmerged segment $d")
    }
    // the merged segment still shadows the base copy of id 5
    assert(II.shadowOf(spark, work, newOrd)
      .as[Long].collect().toSet === Set(5L))
    assertServeMatchesReference(work, Seq(0L, 5L, 9L))
    // and the correction still serves fresh post-compaction
    val out = II.serve(spark, work, Seq(0L).toDF("query_id"),
      ef = 16, k = 5).collect()
    assert(out.count(r => r.getLong(2) == 5L) <= 1)
  }

  test("compactUntil folds the lifecycle back toward its target " +
      "segment count and never exceeds the budget") {
    import spark.implicits._
    val (work, budget) = freshWork()
    val e = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") < 30)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // three small append-only seals
    Seq(0, 1, 2).foreach { b =>
      val delta = e.slice(b * 10, b * 10 + 10).toSeq
        .map { case (id, v) => (id + 300000L + b * 1000L, v) }
        .toDF("vec_id", "embedding")
      II.sealDelta(spark, work, delta)
    }
    val before = II.segs(spark, work).size
    val steps = II.compactUntil(spark, work, maxSegs = before - 2,
      budgetBytes = budget)
    assert(steps.size === 2)
    assert(II.segs(spark, work).size === before - 2)
    // every surviving segment's image fits the budget it was sized to
    val dim = Search.embNormed(spark, sfDir)
      .select(size(col("embedding"))).head.getInt(0)
    II.segs(spark, work).foreach { s0 =>
      val n = spark.read.parquet(s"${s0.dir}/embeddings.parquet").count()
      assert(n * Hnsw.imageBytesPerVec(dim) <=
        budget + budget / 4 + 64L * Hnsw.imageBytesPerVec(dim))
    }
    assertServeMatchesReference(work, Seq(0L, 3L, 7L))
    // MIXED-SCHEMA merge: a base segment carries the full embeddings
    // row (label column), a sealed segment only the ingest contract —
    // the pair must still compact (missing columns null-fill). Under
    // the doubled window the tier sequence reaches a base+seal pair.
    val idsBefore = latestWins(work)
    val more = II.compactUntil(spark, work, maxSegs = 3,
      budgetBytes = budget * 2)
    assert(more.size === 2)
    assert(II.segs(spark, work).size === 3)
    assert(latestWins(work) === idsBefore,
      "mixed-schema compaction changed the latest-wins corpus")
    assertServeMatchesReference(work, Seq(0L, 3L, 7L))
  }

  test("shadow derivation equals the first-principles intersection on " +
      "BOTH arms (full-scan and sidecar-probed): corrections " +
      "verified, fresh ids cleared") {
    import spark.implicits._
    val (work, _) = freshWork()
    val v0 = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") === 0).select("embedding").head
      .getSeq[Float](0).toArray
    val deltaIds = Seq(2L, 4L, 6L, 400000L, 400001L)
    val delta = deltaIds.map(id => (id, v0.map(_ * 0.5f)))
      .toDF("vec_id", "embedding")
    val seg = II.sealDelta(spark, work, delta)
    assert(seg.nonEmpty)
    // whatever arm the crossover rule picked at seal time
    val got = II.shadowOf(spark, work, seg.get.ord)
      .as[Long].collect().toSet
    val older = II.segs(spark, work).filter(_.ord < seg.get.ord)
    val olderIds = older
      .map(s0 => spark.read.parquet(s"${s0.dir}/embeddings.parquet")
        .select("vec_id"))
      .reduce(_.unionByName(_)).as[Long].collect().toSet
    assert(got === deltaIds.toSet.intersect(olderIds))
    assert(got === Set(2L, 4L, 6L),
      "shadow derivation must flag exactly the corrections")
    // the sidecar arm, forced, must agree with the sealed shadow
    val sidecar = II.deriveShadowIdsSidecar(spark, older,
      deltaIds.toDF("vec_id"))
      .map(_.distinct().as[Long].collect().toSet)
      .getOrElse(Set.empty[Long])
    assert(sidecar === got,
      "the sidecar arm diverged from the sealed shadow")
  }

  test("a crash between compaction publish and cleanup leaves a " +
      "SERVABLE state: the max-generation dedupe hides the old " +
      "generation, duplicate candidates collapse, and corrections " +
      "still serve fresh and once") {
    import spark.implicits._
    val (work, budget) = freshWork()
    val v0 = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") === 0).select("embedding").head
      .getSeq[Float](0).toArray
    // the first seal carries a row that SURVIVES the merge (300000) —
    // in the crash state the resurrected older segment and the merged
    // segment both hold it, so the duplicate-collapse is load-bearing
    II.sealDelta(spark, work,
      Seq((5L, v0.map(_ * 0.25f)), (300000L, v0.map(_ * 0.5f)))
        .toDF("vec_id", "embedding"))
    II.sealDelta(spark, work,
      Seq((5L, v0.map(_ * -0.25f)), (200000L, v0.map(_ * 0.125f)))
        .toDF("vec_id", "embedding"))
    val ssBefore = II.segs(spark, work)
    val pair = Seq(ssBefore(ssBefore.size - 2), ssBefore.last)
    // snapshot the paths compaction will delete
    val backup = java.nio.file.Files
      .createTempDirectory("graft_crash_backup")
    val cp = IncrementalIndexSpec.copyDir _
    val savedDirs = pair.map { s0 =>
      val src = java.nio.file.Paths.get(s0.dir)
      val dst = backup.resolve(src.getFileName)
      cp(src, dst)
      (dst, src)
    }
    val savedShadows = pair.flatMap(s0 =>
      II.shadowPathOf(spark, work, s0.ord)).map { sp =>
      val src = java.nio.file.Paths.get(sp)
      val dst = backup.resolve(src.getFileName)
      cp(src, dst)
      (dst, src)
    }
    val merged = II.compactOnce(spark, work, budget)
    assert(merged.nonEmpty)
    val cleanSegs = II.segs(spark, work)
    // resurrect the deleted paths: this IS the publish-done,
    // cleanup-missed crash state
    (savedDirs ++ savedShadows).foreach { case (dst, src) =>
      if (!java.nio.file.Files.exists(src)) cp(dst, src)
    }
    val crashSegs = II.segs(spark, work)
    assert(crashSegs.size === cleanSegs.size + 1,
      "the resurrected OLDER ordinal must be visible again")
    assert(crashSegs.find(_.ord == merged.get._2).get.dir ===
      cleanSegs.find(_.ord == merged.get._2).get.dir,
      "the old generation of the merged ordinal must stay hidden " +
        "behind the published one")
    val out = II.serve(spark, work, Seq(0L, 7L).toDF("query_id"),
      ef = 16, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    Seq(0L, 7L).foreach { qid =>
      val mine = out.filter(_._1 == qid)
      assert(mine.map(_._3).distinct.length === mine.length,
        s"crash-state serve reported a duplicate id for query $qid")
      assert(mine.length === 5)
    }
    // the correction still serves once, from the NEWEST row
    val for0 = out.filter(_._1 == 0L)
    assert(for0.count(_._3 == 5L) <= 1)
    for0.filter(_._3 == 5L).foreach(t => assert(t._4 === -1.0 ||
      t._4 < 0, "corrected id 5 must score from the newest (negated) " +
        "embedding"))
    // the survivor held by BOTH the merged and the resurrected older
    // segment reports exactly once, at its exact score
    assert(for0.count(_._3 == 300000L) === 1,
      "the doubly-held survivor must collapse to one report")
    assert(for0.find(_._3 == 300000L).get._4 === 1.0)
    // clean up the resurrection so later reads see the clean state
    (savedDirs ++ savedShadows).foreach { case (_, src) =>
      if (!cleanSegs.exists(_.dir == src.toString)) fs0(work).delete(
        new org.apache.hadoop.fs.Path(src.toString), true)
    }
  }

  test("generation parsing is basename-only: a work path containing " +
      "\"_g\" seals and compacts without mis-parsing") {
    import spark.implicits._
    // createTempDirectory("graft_gdir") yields a path containing "_g"
    val work = java.nio.file.Files
      .createTempDirectory("graft_gdir").toString
    assert(work.contains("_g"))
    val stats = Search.embNormed(spark, sfDir)
      .agg(count(lit(1)), first(size(col("embedding")))).head
    val budget = math.max(1L,
      stats.getLong(0) * Hnsw.imageBytesPerVec(stats.getInt(1)) / 3)
    II.initSegments(spark, sfDir, work, budget)
    val v0 = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") === 0).select("embedding").head
      .getSeq[Float](0).toArray
    II.sealDelta(spark, work,
      Seq((5L, v0.map(_ * 0.25f))).toDF("vec_id", "embedding"))
    II.sealDelta(spark, work,
      Seq((6L, v0.map(_ * 0.2f))).toDF("vec_id", "embedding"))
    val merged = II.compactOnce(spark, work, budget)
    assert(merged.nonEmpty,
      "compaction must succeed under a \"_g\" work path")
    assertServeMatchesReference(work, Seq(0L, 3L))
  }

  test("queryVecs: the single multi-path scan equals the S-leg union " +
      "twin across seals, a legacy basename, and a _g-bearing work path") {
    import spark.implicits._
    // work path deliberately carries a segment-shaped component: the
    // ordinal regex must bind to the basename-before-embeddings only
    val work = java.nio.file.Files.createTempDirectory(
      "graft_qv_seg_7_g9_").toString
    val stats = Search.embNormed(spark, sfDir)
      .agg(count(lit(1)), first(size(col("embedding")))).head
    val budget = math.max(1L,
      stats.getLong(0) * Hnsw.imageBytesPerVec(stats.getInt(1)) / 3)
    II.initSegments(spark, sfDir, work, budget)
    // a seal that CORRECTS ids the base segments hold: latest-wins must
    // pick the sealed rows, so an ordinal mis-parse would flip winners
    val corrected = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") < 6).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_ * 0.5f)))
    II.sealDelta(spark, work, corrected.toSeq.toDF("vec_id", "embedding"))
    // one base segment renamed to the unsuffixed LEGACY basename
    // (generation 0 by contract — segs() and the regex must agree)
    val f = fs0(work)
    f.rename(
      new org.apache.hadoop.fs.Path(s"$work/segments/seg_1_g0"),
      new org.apache.hadoop.fs.Path(s"$work/segments/seg_1"))
    val ss = II.segs(spark, work)
    assert(ss.exists(_.dir.endsWith("/seg_1")), "legacy basename lost")
    val qids = Seq(0L, 1L, 2L, 5L, 7L, 999999L).toDF("query_id")
    val got = II.queryVecs(spark, ss, qids)
      .sortBy(_._1).map(t => (t._1, t._2.toSeq, t._3))
    val ref = II.queryVecsUnion(spark, ss, qids)
      .sortBy(_._1).map(t => (t._1, t._2.toSeq, t._3))
    assert(got === ref, "single-scan resolution diverged from the union")
    // the corrected ids must resolve from the SEALED segment (halved
    // first component) — pins that the extracted ordinal orders seals
    // above the base segments
    val gotHead = got.filter(_._1 == 0L).head._2.head
    val base = Search.embNormed(spark, sfDir)
      .filter(col("vec_id") === 0).select("embedding").head
      .getSeq[Float](0).head
    assert(gotHead === base * 0.5f, "latest-wins winner not the seal")
  }

}

/** Suite-shared fixture state: the pristine init layout, built once
  * per JVM. Tests never serve FROM the pristine (every test copies it
  * first), so it can never be mutated. */
object IncrementalIndexSpec {
  import graft.operators.{Hnsw, IncrementalIndex => II, Search}
  import org.apache.spark.sql.functions._

  @volatile private var built: Option[(String, Long)] = None

  def pristine(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): (String, Long) = synchronized {
    built.getOrElse {
      val work = java.nio.file.Files
        .createTempDirectory("graft_incr_pristine").toString
      val stats = Search.embNormed(spark, sfDir)
        .agg(count(lit(1)), first(size(col("embedding")))).head
      val budget = math.max(1L,
        stats.getLong(0) * Hnsw.imageBytesPerVec(stats.getInt(1)) / 3)
      II.initSegments(spark, sfDir, work, budget)
      // build the init segments' hierarchies once; every copy aliases
      // them via shareIndex (content-identical)
      II.segs(spark, work).foreach(s0 => Hnsw.indexFor(spark, s0.dir))
      built = Some((work, budget))
      (work, budget)
    }
  }

  def copyDir(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    java.nio.file.Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
