package graft
package operators

import org.apache.spark.sql.functions._

/** OPQ rotation ([[Ann.qPqRotation]]/[[Ann.qPqRotate]]) — the learned-
  * rotation half of Ge et al. 2014 beside [[Ann.qPqBalance]]'s
  * permutation half: drift-pinned golden artifact, orthonormality,
  * eigen-ordered variance, and the quantization-error comparison
  * against the permutation-only allocation through the UNCHANGED PQ
  * encode/error plans.
  */
class PqRotateSpec extends SparkSpec {

  private val goldDir = "/root/testdata/sf0.01"

  test("rotation: live training matches the committed golden artifact") {
    val live = Ann.trainRotationMicro(spark, goldDir).toSet
    val committed = spark.read
      .parquet(s"$fixturesDir/pq_rotation_sf0.01.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(live === committed,
      "trained rotation drifted from the committed artifact — " +
        "regenerate via GoldenChunks if the change is intentional")
  }

  test("rotation: orthonormal at micro precision, variance eigen-ordered") {
    val rot = Ann.trainRotationMicro(spark, sfDir)
    val dim = Ann.Dim
    val r = Array.ofDim[Double](dim, dim)
    rot.foreach { case (k, d, m) => r(k.toInt)(d.toInt) = m / 1e6 }
    // R·Rᵀ ≈ I (micro quantization bounds the off-diagonal residue)
    for (i <- 0 until dim; j <- 0 until dim) {
      val dot = (0 until dim).map(d => r(i)(d) * r(j)(d)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-3, s"R·Rᵀ($i,$j)=$dot")
    }
    // rotated-component variances are (approximately) the eigenvalues,
    // so they must be non-increasing in k up to quantization noise:
    // var_k = E[y²] − E[y]²
    val vars = Ann.qPqRotate(spark, sfDir)
      .withColumn("yd", col("y").cast("double"))
      .groupBy("k")
      .agg((sum(col("yd") * col("yd")) / count(lit(1)) -
        (sum(col("yd")) / count(lit(1))) * (sum(col("yd")) / count(lit(1))))
        .as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
      .sortBy(_._1).map(_._2)
    val tol = vars.head * 1e-3 + 1e-6
    vars.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + tol, s"variance not eigen-ordered: $a then $b")
    }
  }

  test("rotation: quantization error through the unchanged PQ plans " +
      "vs the permutation-only allocation") {
    import spark.implicits._
    val rotated = Ann.pqComponentsRotated(spark, sfDir)
    val eRot = Ann.pqQuantError(rotated, Ann.pqBootstrapCents(rotated))
    val balanced = Ann.qPqBalance(spark, sfDir).select(col("d"), col("sub"))
    val perm = Ann.pqComponentsMapped(spark, sfDir, balanced)
    val ePerm = Ann.pqQuantError(perm, Ann.pqBootstrapCents(perm))
    assert(eRot > 0 && ePerm > 0)
    info(f"quant error: rotated=$eRot permuted=$ePerm " +
      f"ratio=${eRot.toDouble / ePerm}%.4f")
    // Ge et al.'s gain is from concentrating energy into an aligned
    // basis; the pin is measured on this corpus and must not regress
    assert(eRot <= ePerm,
      s"rotated error $eRot exceeds permutation-only $ePerm")
    // codes stay SubSpaces wide through the unchanged encode
    val codes = Ann.pqAssign(rotated, Ann.pqBootstrapCents(rotated))
    val bad = codes.groupBy("vec_id").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= Ann.SubSpaces.toLong).count()
    assert(bad === 0)
  }

  test("the IVF-PQ SERVE rides the trained rotation: recall@10 vs the " +
      "exact top-10 is >= the permutation-only serve's") {
    val exact = Search.qKnn(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(_.getLong(0)).toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val rot = recall(Ann.qAnnIvfPq(spark, sfDir))
    val perm = recall(Ann.qAnnIvfPqPerm(spark, sfDir))
    info(f"ivfpq recall@10: rotated=$rot%.2f permutation-only=$perm%.2f")
    assert(rot >= perm,
      s"rotated IVF-PQ serve recall $rot regressed below the " +
        s"permutation-only serve's $perm")
  }

  test("truncated retrieval: full-width rotated serve recovers the " +
      "exact top-10, prefixes degrade gracefully") {
    val rows = Ann.qTruncRecall(spark, goldDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.keySet === Ann.TruncDims.map(_.toLong).toSet)
    // an (approximately) orthonormal rotation preserves the ranking:
    // the full 64-dim prefix is just the rotated exact serve
    assert(rows(64L) >= 0.9,
      s"full-width rotated recall ${rows(64L)} lost the exact top-10")
    // more prefix can only help on average; pin the endpoints
    assert(rows(64L) >= rows(4L),
      "full-width recall below the 4-dim prefix's")
  }
}
