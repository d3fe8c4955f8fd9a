package graft
package operators

import org.apache.spark.sql.functions._

/** Embedding covariance ([[Ann.qEmbCov]]): exact-integer Gram sums that
  * are partitioning-invariant, plus the driver-side eigen-analysis the
  * operator exists to feed (64×64 Jacobi on the one bounded matrix) —
  * PSD spectrum, trace preservation, anisotropy / effective rank in
  * range.
  */
class EmbCovSpec extends SparkSpec {

  private lazy val rows = Ann.qEmbCov(spark, sfDir).collect()

  test("emb cov: triangle shape and exact sums vs direct recompute") {
    val dim = Ann.Dim
    assert(rows.length === dim * (dim + 1) / 2)
    // independent recompute of a handful of entries from collected data
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        math.round(x.toDouble * 1000)))
    val n = vecs.length.toLong
    Seq((0, 0), (0, 63), (7, 11), (63, 63)).foreach { case (i, j) =>
      val sI = vecs.map(_(i)).sum
      val sJ = vecs.map(_(j)).sum
      val sIj = vecs.map(v => v(i) * v(j)).sum
      val r = rows.find(r => r.getInt(0) == i && r.getInt(1) == j).get
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === sI && r.getLong(4) === sJ)
      assert(r.getLong(5) === sIj)
      assert(r.getLong(6) === n * sIj - sI * sJ)
    }
  }

  test("emb cov: partitioning-invariant (mergeable summary)") {
    import spark.implicits._
    def gram(parts: Int) = Tables.embeddings(spark, sfDir)
      .repartition(parts)
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1000, 0).cast("long")).as("se"))
      .as[Seq[Long]]
      .select(graft.functions.GramAggregator.gram(Ann.Dim))
      .collect()
    assert(gram(1).toSeq === gram(7).toSeq)
  }

  test("emb cov: spectrum is PSD, trace-preserving, anisotropy in range") {
    val dim = Ann.Dim
    val n = rows.head.getLong(2).toDouble
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val v = r.getLong(6).toDouble / (n * n * 1e6)
      cov(r.getInt(0))(r.getInt(1)) = v
      cov(r.getInt(1))(r.getInt(0)) = v
    }
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    assert(trace > 0)
    (0 until dim).foreach(i => assert(cov(i)(i) >= 0))

    // cyclic Jacobi eigenvalue iteration on the symmetric 64x64
    val a = cov.map(_.clone())
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 50 && off > 1e-18) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
                case x => x
              }
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < dim) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < dim) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = (for (i <- 0 until dim; j <- 0 until dim if i != j)
        yield a(i)(j) * a(i)(j)).sum
      sweep += 1
    }
    val eig = (0 until dim).map(i => a(i)(i)).sortBy(-_)
    // PSD up to numerical noise; eigen sum preserves the trace
    assert(eig.forall(_ > -1e-12), s"negative eigenvalue: ${eig.last}")
    assert(math.abs(eig.sum - trace) < 1e-9 * math.max(1.0, trace))
    // anisotropy: top-eigenvalue share of total variance
    val anis = eig.head / trace
    assert(anis > 0 && anis <= 1.0)
    // effective rank (exp of spectral entropy) in (0, dim]
    val pos = eig.filter(_ > 1e-18)
    val ps = pos.map(_ / pos.sum)
    val effRank = math.exp(-ps.map(p => p * math.log(p)).sum)
    assert(effRank > 0 && effRank <= dim + 1e-9, s"effRank=$effRank")
  }
}
