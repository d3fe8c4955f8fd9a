package graft
package search

import org.apache.spark.sql.functions._

import graft.operators.{Ann, AnnGeometry}

/** Scale-parameterized ANN geometry (r7 verdict item 1): corpus-derived
  * defaults, pinned-geometry equivalence, multi-table OR-of-ANDs
  * candidate semantics, and measured-skew salting. */
class AnnGeometrySpec extends SparkSpec {

  test("forCorpus targets constant bucket occupancy and sqrt-N cells") {
    // planes grows with log2(N/occupancy), never below the pinned 4
    assert(AnnGeometry.forCorpus(100) === AnnGeometry(4, 2, 8))
    assert(AnnGeometry.forCorpus(10000).planes === 8)       // 10000/64→157→2^8
    assert(AnnGeometry.forCorpus(25000).planes === 9)       // 391→2^9
    assert(AnnGeometry.forCorpus(1000000).planes === 14)    // 15625→2^14
    // doubling N adds at most one plane: occupancy stays ~constant
    val seq = (10 to 30).map(i => AnnGeometry.forCorpus(1L << i).planes)
    assert(seq.sliding(2).forall(w => w(1) - w(0) <= 1 && w(1) >= w(0)))
    // cells ≈ sqrt(N) (pow2-floored), never below the pinned 8
    assert(AnnGeometry.forCorpus(10000).ivfCells === 64)
    assert(AnnGeometry.forCorpus(1000000).ivfCells === 512)
    assert(AnnGeometry.forCorpus(10).ivfCells === 8)
  }

  test("lshTables at the pinned geometry reproduces lshBuckets; " +
      "table 0 of a wider geometry reproduces it too") {
    val pinned = Ann.lshBuckets(spark, sfDir)
    val viaTables = Ann.lshTables(spark, sfDir, AnnGeometry.Pinned)
    assert(viaTables.filter(col("table") =!= 0).count() === 0)
    assert(viaTables.drop("table").exceptAll(pinned).isEmpty &&
      pinned.exceptAll(viaTables.drop("table")).isEmpty)
    // a 2-table geometry at the same plane count: table 0 slices the
    // SAME global hyperplane family, so its buckets are bit-identical
    val two = Ann.lshTables(spark, sfDir, AnnGeometry(4, 2, 8))
    val t0 = two.filter(col("table") === 0).drop("table")
    assert(t0.exceptAll(pinned).isEmpty && pinned.exceptAll(t0).isEmpty)
    assert(two.filter(col("table") === 1).count() === pinned.count())
  }

  test("multi-table candidates are a superset of single-table; " +
      "per-vector top-k can only improve") {
    val geo2 = AnnGeometry(4, 2, 8)
    val p1 = Ann.knnCandidatePairs(spark, sfDir, AnnGeometry.Pinned)
    val p2 = Ann.knnCandidatePairs(spark, sfDir, geo2)
    assert(p1.exceptAll(p2).isEmpty, "table-0 pair lost in 2-table run")
    assert(p2.count() >= p1.count())
    // OR-of-ANDs can only raise each vector's rank-1 score
    val r1 = Ann.qKnnJoinG(spark, sfDir).filter(col("rank") === 1)
      .select(col("vec_id"), col("score").as("s1"))
    val r2 = Ann.qKnnJoinG(spark, sfDir, geo2).filter(col("rank") === 1)
      .select(col("vec_id"), col("score").as("s2"))
    assert(r1.join(r2, "vec_id").filter(col("s2") < col("s1")).count() === 0)
    // and duplicates collapse: ranks stay dense 1..n per vector
    val bad = Ann.qKnnJoinG(spark, sfDir, geo2).groupBy("vec_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() === 0)
    // no neighbor repeats within a vector's list (the distinct works)
    val dup = Ann.qKnnJoinG(spark, sfDir, geo2)
      .groupBy("vec_id", "neighbor_id").count().filter(col("count") > 1)
    assert(dup.count() === 0)
  }

  test("higher plane counts shrink the candidate pair volume") {
    val n = Tables.embeddings(spark, sfDir).count()
    val wide = Ann.knnCandidatePairs(spark, sfDir,
      AnnGeometry(planes = 8, tables = 1, ivfCells = 8)).count()
    val pinned = Ann.knnCandidatePairs(spark, sfDir, AnnGeometry.Pinned).count()
    assert(wide < pinned,
      s"8 planes should cut candidates vs 4 (got $wide vs $pinned, n=$n)")
  }

  test("qDedupEmbedLshG: registry twin unchanged; a wider geometry's " +
      "top-20 can only get closer pairs") {
    val pinned = operators.Dedup.qDedupEmbedLsh(spark, sfDir)
    val viaG = operators.Dedup.qDedupEmbedLshG(spark, sfDir)
    assert(viaG.exceptAll(pinned).isEmpty && pinned.exceptAll(viaG).isEmpty)
    val floorPinned = pinned.agg(min("score")).head.getDouble(0)
    val floorWide = operators.Dedup
      .qDedupEmbedLshG(spark, sfDir, AnnGeometry(4, 2, 8))
      .agg(min("score")).head.getDouble(0)
    assert(floorWide >= floorPinned)
  }

  test("qKnnJoinG at a forCorpus geometry keeps the pinned plan shape: " +
      "equi-join candidates, bounded aggregator, no window, no cartesian") {
    val p = Ann.qKnnJoinG(spark, sfDir, AnnGeometry(8, 2, 8))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // (the salt-range crossJoin IS a tiny BroadcastNestedLoopJoin by
    // design — an 8-row broadcast; the hazard pins are the corpus-pair
    // cartesian, a rank window, and an unbounded aggregate)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("saltFor: >= baseline 8, power of two, capped at 64, memoized") {
    val s = Ann.saltFor(spark, sfDir, AnnGeometry.Pinned)
    assert(s >= 8L && s <= 64L && java.lang.Long.bitCount(s) === 1)
    assert(Ann.saltFor(spark, sfDir, AnnGeometry.Pinned) === s)
  }

  test("qAnnLshG: pinned geometry reproduces qAnnLsh's rows; " +
      "multi-table serve recall never drops below single-table at the " +
      "same plane count") {
    val viaG = operators.Ann.qAnnLshG(spark, sfDir)
    val pinned = operators.Ann.qAnnLsh(spark, sfDir).select("vec_id", "score")
    assert(viaG.exceptAll(pinned).isEmpty && pinned.exceptAll(viaG).isEmpty)
    val exact = operators.Search.qKnn(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def recall(geo: AnnGeometry): Double =
      operators.Ann.qAnnLshG(spark, sfDir, geo)
        .select("vec_id").collect().map(_.getLong(0))
        .count(exact) / 10.0
    // 6+ planes is where a single table starves (the tuned-operating-
    // point rationale in Ann's scaladoc); extra tables must monotonically
    // recover candidates, hence recall
    val single = recall(AnnGeometry(6, 1, 8))
    val multi = recall(AnnGeometry(6, 3, 8))
    assert(multi >= single, s"multi $multi < single $single")
  }

  test("qKnnJoinG at a wider geometry: every reported neighbor still " +
      "shares a bucket in some table, scored exactly") {
    val geo = AnnGeometry(planes = 6, tables = 3, ivfCells = 8)
    val out = Ann.qKnnJoinG(spark, sfDir, geo)
    val bt = Ann.lshTables(spark, sfDir, geo)
    val q = bt.select(col("vec_id"), col("table").as("t"),
      col("bucket").as("qb"))
    val nb = bt.select(col("vec_id").as("neighbor_id"), col("table").as("t"),
      col("bucket").as("nb"))
    val mates = q.join(nb, Seq("t"))
      .filter(col("qb") === col("nb") && col("vec_id") =!= col("neighbor_id"))
      .select("vec_id", "neighbor_id").distinct()
    assert(out.join(mates, Seq("vec_id", "neighbor_id"), "left_anti")
      .count() === 0, "reported neighbor not a bucket-mate in any table")
  }
}
