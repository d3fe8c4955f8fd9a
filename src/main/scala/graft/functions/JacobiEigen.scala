package graft.functions

/** Cyclic Jacobi eigendecomposition of a small symmetric matrix —
  * the driver-side half of the OPQ rotation (Ge et al. 2014: rotate
  * into the covariance eigenbasis before product quantization). The
  * distributed work is the ONE corpus pass of
  * [[graft.operators.Ann.qEmbCov]]; this runs on the bounded Dim×Dim
  * matrix it emits (64×64 here — microseconds), the same division of
  * labor as the union-find and beam-state driver steps elsewhere.
  *
  * Determinism: fixed sweep order, fixed convergence budget, and a
  * canonical output form — eigenpairs sorted by eigenvalue desc (index
  * asc on exact ties) with each eigenvector's sign fixed so its
  * largest-|component| entry (lowest index on ties) is positive. The
  * same input matrix therefore always yields bit-identical output,
  * which is what lets the trained rotation be published as a golden
  * artifact and replayed by the DuckDB oracle.
  */
object JacobiEigen {

  /** Eigen-decompose symmetric `m` (not mutated). Returns
    * `(eigenvalues, vectors)` with `vectors(k)` the row eigenvector
    * for `eigenvalues(k)`: `m ≈ Σ_k λ_k v_kᵀ v_k`, and `y = R x` with
    * `R(k)(d) = vectors(k)(d)` maps a vector into the eigenbasis. */
  def eigenSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val dim = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
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
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          if (i != j) off += a(i)(j) * a(i)(j)
          j += 1
        }
        i += 1
      }
      sweep += 1
    }
    // canonical order and sign
    val order = (0 until dim).sortBy(i => (-a(i)(i), i))
    val eig = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(dim)(d => v(d)(i))
      var best = 0
      var d = 1
      while (d < dim) {
        if (math.abs(col(d)) > math.abs(col(best))) best = d
        d += 1
      }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (eig, vecs)
  }
}
