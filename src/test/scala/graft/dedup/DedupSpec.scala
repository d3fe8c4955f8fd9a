package graft
package dedup

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup}

/** Semantic invariants of the dedup + ANN family (exact values are
  * checked against the DuckDB oracle by the Verify gate; these pin the
  * properties that must hold regardless of data). */
class DedupSpec extends SparkSpec {

  test("exact dedup: every doc lands in exactly one fingerprint group") {
    val docs = Tables.documents(spark, sfDir).count()
    val groups = Dedup.qDedupExact(spark, sfDir)
    assert(groups.agg(sum("n_docs")).head.getLong(0) === docs)
    // fingerprints are unique group keys
    assert(groups.select("fp").distinct().count() === groups.count())
  }

  test("minhash signatures: 16 per doc, stable across recomputation") {
    val sig = Dedup.qMinhashSig(spark, sfDir)
    val perDoc = sig.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSet === Set(16L))
    // determinism: same input → identical signature matrix
    val again = Dedup.qMinhashSig(spark, sfDir)
    assert(sig.exceptAll(again).isEmpty && again.exceptAll(sig).isEmpty)
  }

  test("component labels: driver union-find == distributed propagation") {
    // the size gate picks the driver path on test data; force the
    // distributed loop on the same edges and require the identical
    // fixpoint (component-minimum labels)
    val pairs = Dedup.nearDupPairs(spark, sfDir)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val viaLoop = Dedup.propagateMinLabels(pairs)
    val viaUf = {
      val spark2 = spark
      import spark2.implicits._
      Dedup.unionFindMinLabels(
        pairs.collect().map(r => (r.getLong(0), r.getLong(1))))
        .toSeq.toDF("doc_id", "grp")
    }
    assert(viaLoop.exceptAll(viaUf).isEmpty && viaUf.exceptAll(viaLoop).isEmpty)
    // sanity on the fixpoint: every label is the minimum of its group
    val badRoot = viaUf.groupBy("grp").agg(min("doc_id").as("lo"))
      .filter(col("grp") =!= col("lo")).count()
    assert(badRoot === 0)
  }

  test("minhash LSH candidates are a superset of high-Jaccard pairs") {
    // any pair with identical shingle sets must share all 4 band sigs
    val cand = Dedup.qDedupMinhash(spark, sfDir)
    // jaccard column is a valid ratio
    val bad = cand.filter(col("jaccard") < 0 || col("jaccard") > 1).count()
    assert(bad === 0)
  }

  test("simhash: 16-bit range and deterministic") {
    val sh = Dedup.qDedupSimhash(spark, sfDir)
    val bad = sh.filter(col("simhash") < 0 || col("simhash") > 65535).count()
    assert(bad === 0)
    assert(sh.count() === Tables.documents(spark, sfDir).count())
  }

  test("embedding near-dup pairs are ordered and within cosine bounds") {
    val p = Dedup.qDedupEmbed(spark, sfDir).collect()
    assert(p.length <= 20)
    p.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val s = r.getDouble(2)
      assert(s >= -1.000001 && s <= 1.000001)
    }
    // descending by score
    val scores = p.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("LSH-bucketed embed dedup: pairs co-bucketed, scores exact") {
    val pairs = Dedup.qDedupEmbedLsh(spark, sfDir).collect()
    assert(pairs.nonEmpty && pairs.length <= 20)
    val buckets = Ann.lshBuckets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b)
      assert(buckets(a) === buckets(b), s"pair ($a,$b) not co-bucketed")
    }
    // candidate pruning never invents pairs: every LSH pair's score
    // appears identically in the brute-force twin's full pair spectrum
    val brute = Dedup.qDedupEmbed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs.filter(r => r.getLong(1) < 1000).foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      brute.get(k).foreach(s => assert(math.abs(s - r.getDouble(2)) < 1e-9))
    }
  }

  test("LSH buckets: 4-bit range, one bucket per vector, deterministic") {
    val b = Ann.lshBuckets(spark, sfDir)
    assert(b.count() === Tables.embeddings(spark, sfDir).count())
    assert(b.filter(col("bucket") < 0 || col("bucket") > 15).count() === 0)
    val again = Ann.lshBuckets(spark, sfDir)
    assert(b.exceptAll(again).isEmpty)
  }

  test("ANN results are true neighbors: LSH/IVF scores ⊆ exact top spectrum") {
    // every ANN hit's score must be ≤ the exact brute-force best score
    import graft.operators.Search
    val exactTop = Search.qKnn(spark, sfDir).agg(max("score")).head.getDouble(0)
    val lsh = Ann.qAnnLsh(spark, sfDir).agg(max("score")).head.getDouble(0)
    val ivf = Ann.qAnnIvf(spark, sfDir).agg(max("score")).head.getDouble(0)
    assert(lsh <= exactTop + 1e-9)
    assert(ivf <= exactTop + 1e-9)
  }

  test("PQ: every vector gets one code per subspace; rescored scores are exact") {
    val codes = Ann.pqCodes(spark, sfDir)
    val nVec = Tables.embeddings(spark, sfDir).count()
    assert(codes.count() === nVec * Ann.SubSpaces)
    assert(codes.filter(col("code") < 0 || col("code") >= Ann.PqCentroids)
      .count() === 0)
    // a codebook vector's nearest centroid in every subspace is itself
    val selfMiss = codes.filter(col("vec_id") < Ann.PqCentroids &&
      col("code") =!= col("vec_id")).count()
    assert(selfMiss === 0)
    // stage-2 rescoring means PQ scores are true cosines: each must
    // appear in the exact spectrum (≤ brute-force best)
    import graft.operators.Search
    val exactTop = Search.qKnn(spark, sfDir).agg(max("score")).head.getDouble(0)
    val pqTop = Ann.qAnnPq(spark, sfDir).agg(max("score")).head.getDouble(0)
    assert(pqTop <= exactTop + 1e-9)
  }

  test("kmeans step: every vector counted once, means bounded by components") {
    val q = Ann.qKmeansStep(spark, sfDir).cache()
    val nVec = Tables.embeddings(spark, sfDir).count()
    val dim = Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).head.getInt(0)
    // each (cell,pos) partition of the corpus: Σ n_members = n_vec per pos
    val perPos = q.groupBy("pos").agg(sum("n_members").as("n"))
    assert(perPos.filter(col("n") =!= nVec).count() === 0)
    assert(q.count() <= 8L * dim)
    // mean is the exact quotient of the row's own sum and count
    assert(q.filter(col("avg_micro") =!=
      col("sum_micro").cast("double") / col("n_members")).count() === 0)
    // a centroid component mean can't exceed the max member component
    val maxMicro = Tables.embeddings(spark, sfDir)
      .select(explode(col("embedding")).as("c"))
      .agg(max(round(col("c").cast("double") * 1000000, 0))).head.getDouble(0)
    assert(q.agg(max("avg_micro")).head.getDouble(0) <= maxMicro)
    q.unpersist()
  }

  test("simhash near-dup: banding finds EVERY pair within hamming 3 (pigeonhole)") {
    val sigs = Dedup.simhashSigs(spark, sfDir).cache()
    // ground truth by brute-force self-join on the tiny sf0.001 corpus
    val a = sigs.select(col("doc_id").as("doc_a"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sb"))
    val truth = a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
    val banded = Dedup.qSimhashNear(spark, sfDir)
    // 4 bands × 4 bits over 16 bits ⇒ zero false negatives at distance ≤3
    assert(banded.exceptAll(truth).isEmpty && truth.exceptAll(banded).isEmpty)
    // planted near-dups (jaccard ≈ .99 pairs) must surface
    assert(banded.count() > 0)
    sigs.unpersist()
  }

  test("simhash rep: rep-level report reconciles exactly with the all-pairs audit twin") {
    val docs = Tables.documents(spark, sfDir)
    val fps = docs.select(col("doc_id"), md5(col("text")).as("fp"))
    val repOf = fps.groupBy("fp").agg(min("doc_id").as("rep_id"))
    val m = fps.join(repOf, "fp").select(col("doc_id"), col("rep_id")).cache()
    val audit = Dedup.qSimhashNear(spark, sfDir).cache()
    // cross-group audit pairs, re-keyed to their reps, must aggregate to
    // EXACTLY the rep-level rows (same hamming, doc_pairs = n_a·n_b)
    val mapped = audit
      .join(m.select(col("doc_id").as("doc_a"), col("rep_id").as("ra")), "doc_a")
      .join(m.select(col("doc_id").as("doc_b"), col("rep_id").as("rb")), "doc_b")
      .filter(col("ra") =!= col("rb"))
      .select(least(col("ra"), col("rb")).as("rep_a"),
        greatest(col("ra"), col("rb")).as("rep_b"), col("hamming"))
      .groupBy("rep_a", "rep_b", "hamming")
      .agg(count(lit(1)).as("doc_pairs"))
      .select("rep_a", "rep_b", "hamming", "doc_pairs")
    val rep = Dedup.qSimhashRep(spark, sfDir)
      .select("rep_a", "rep_b", "hamming", "doc_pairs")
    assert(rep.exceptAll(mapped).isEmpty && mapped.exceptAll(rep).isEmpty)
    // and the remaining audit rows are exactly the within-group C(n,2)
    // exact-dup pairs — the report is lossless
    val withinExpected = repOf.join(
        fps.groupBy("fp").agg(count(lit(1)).as("n")), "fp")
      .agg(sum(expr("n * (n - 1) / 2"))).head.getDouble(0).toLong
    val crossTotal = rep.agg(sum("doc_pairs")).head.getLong(0)
    assert(audit.count() === crossTotal + withinExpected)
    m.unpersist(); audit.unpersist()
  }

  test("simhash topk: the rep-first serving twin reconstructs the " +
      "direct per-doc top-5 exactly (candidate volume bounded by the " +
      "deduplicated corpus, answers unchanged)") {
    import org.apache.spark.sql.expressions.Window
    val sigs = Dedup.simhashSigs(spark, sfDir).cache()
    // direct formulation (the pre-r11 serve): per-doc candidates from
    // the full signature table, ranked (hamming asc, id asc), top-5 —
    // brute-forced here on the tiny spec corpus
    val a = sigs.select(col("doc_id"), col("simhash").as("sa"))
    val b = sigs.select(col("doc_id").as("neighbor_id"),
      col("simhash").as("sb"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("hamming"), col("neighbor_id"))
    val direct = a.crossJoin(b)
      .filter(col("doc_id") =!= col("neighbor_id"))
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .filter(col("hamming") <= 3)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("doc_id", "rank", "neighbor_id", "hamming")
    val served = Dedup.qSimhashTopk(spark, sfDir)
      .select("doc_id", "rank", "neighbor_id", "hamming")
    assert(served.exceptAll(direct).isEmpty &&
      direct.exceptAll(served).isEmpty,
      "rep-first top-k diverged from the direct per-doc formulation")
    sigs.unpersist()
  }

  test("lsh tune: nested bands make candidate counts monotone in rows-per-band") {
    val rows = Dedup.qLshTune(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
    assert(rows.map(_.getAs[Long]("rows_per_band")).toSeq == Seq(2L, 4L, 8L))
    // an r=2k band match implies both nested r=k half-band matches, so
    // candidates(r=8) ⊆ candidates(r=4) ⊆ candidates(r=2) structurally
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    assert(cands(0) >= cands(1) && cands(1) >= cands(2))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_est_half") <= r.getAs[Long]("n_candidates"))
    }
  }

  test("semdedup: one representative per component, from inside the component") {
    val s = Dedup.qSemdedup(spark, sfDir)
    val labels = Dedup.componentLabels(spark, sfDir)
    // one output row per component
    assert(s.count() === labels.select("grp").distinct().count())
    // accounting: sizes sum to the labeled population; exactly size-1 dropped
    import org.apache.spark.sql.functions._
    assert(s.agg(sum("group_size")).head.getLong(0) === labels.count())
    assert(s.filter(col("n_dropped") =!= col("group_size") - 1).count() === 0)
    // the kept doc belongs to its own component
    val bad = s.join(labels,
        s("kept_doc") === labels("doc_id") && s("group_id") === labels("grp"),
        "left_anti").count()
    assert(bad === 0)
  }
}
