package graft.similarity

/** PCA / whitening for the embedding family — the learned linear
  * projection the s-series lacked (s05/s17 quantize, the LSH planes
  * are random projections; PCA is the standard pre-step before
  * semantic dedup / clustering at scale, shrinking 64-dim vectors to
  * the few directions that carry the variance).
  *
  * Fit discipline = the BPE / PqCodebook bounded driver fit: moments
  * come from a deterministic ≤`maxSample`-row sample (smallest
  * vec_ids), accumulated as EXACT integers over e-6-quantized
  * coordinates (BigInt — no overflow, no order sensitivity), the
  * 64×64 covariance eigensolved by a single-threaded cyclic Jacobi
  * (deterministic: fixed sweep order, fixed rotation formula,
  * canonical eigenvector signs), and the model dumped to parquet in
  * e-6 integer units so the Spark plan and the DuckDB oracle consume
  * the IDENTICAL numbers — the s03 centroid-dump recipe.
  *
  * Projection algebra (the part that runs corpus-wide) is exact
  * integers end-to-end: with xq = round(x·10⁶), S_j = Σ_sample xq_j,
  * n = sample size, v_e6 the quantized loading,
  * pc_num = Σ_j (n·xq_j − S_j)·v_e6_j is an exact BIGINT
  * (|pc_num| ≤ 64 · 2·(4096·10⁶) · 10⁶ ≈ 5·10¹⁷ < 2⁶³), and
  * pc = pc_num / (n·10¹²), whiten = pc_num / (n·10⁶·sig_e6) are each
  * ONE IEEE division of two exact integers — bit-identical
  * cross-engine, the g01 recurrence discipline.
  */
object Pca {

  /** Fitted model: sample size, per-dim e-6 coordinate sums, top-k
    * eigenvectors quantized to e-6, and e-6 per-component standard
    * deviations (√eigenvalue) for whitening.
    */
  final case class Model(
      n: Long,
      dim: Int,
      sums: Array[Long],          // S_j, exact e-6 units
      loadings: Array[Array[Long]], // [k][j], e-6 units
      sigE6: Array[Long],         // round(√λ_k · 10⁶)
      eigenvalues: Array[Double])

  /** Cyclic Jacobi eigensolver for a symmetric matrix — deterministic
    * (fixed (p,q) sweep order, classic rotation), driver-side on the
    * d×d covariance only (d is the embedding width, never the corpus).
    */
  private[graft] def jacobi(a0: Array[Array[Double]], sweeps: Int = 24)
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    var off = Double.MaxValue
    while (s < sweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → tan = 1
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - sn * aiq
              a(i)(q) = sn * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - sn * aqi
              a(q)(i) = sn * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - sn * viq
              v(i)(q) = sn * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v) // v columns = eigenvectors
  }

  /** Fit on e-6-quantized sample rows (each `xq` of length `dim`):
    * exact integer moments → covariance → Jacobi → top-k components
    * by eigenvalue (desc, first-dimension-index tie-break), each
    * eigenvector sign-canonicalized (largest-|coefficient| entry
    * positive, earliest index on ties) and quantized to e-6.
    */
  def fit(sample: Seq[Array[Long]], dim: Int, k: Int): Model = {
    val n = sample.length.toLong
    require(n >= 2, s"pca fit needs >= 2 sample rows, got $n")
    val sums = Array.fill(dim)(0L)
    sample.foreach { xq =>
      var j = 0
      while (j < dim) { sums(j) += xq(j); j += 1 }
    }
    // exact raw second moments as BigInt (xq*xq ≤ 1e12, n ≤ 4096 →
    // fits Long, but BigInt keeps the n·P − S·S cross exact too)
    val p = Array.fill(dim, dim)(BigInt(0))
    sample.foreach { xq =>
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          p(i)(j) += BigInt(xq(i)) * xq(j)
          j += 1
        }
        i += 1
      }
    }
    val nB = BigInt(n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      // cov in ORIGINAL units: (n·P − S_i·S_j) / (n² · 10¹²)
      (nB * p(a)(b) - BigInt(sums(i)) * BigInt(sums(j))).toDouble /
        (n.toDouble * n.toDouble * 1e12)
    }
    val (evals, evecs) = jacobi(cov)
    val order = (0 until dim).sortBy(i => (-evals(i), i)).take(k)
    val loadings = order.map { ci =>
      val col = Array.tabulate(dim)(j => evecs(j)(ci))
      // canonical sign: the largest-|coefficient| entry positive
      val m = col.indices.maxBy(j => (math.abs(col(j)), -j))
      val sgn = if (col(m) < 0.0) -1.0 else 1.0
      col.map(x => math.round(x * sgn * 1e6))
    }.toArray
    val sig = order.map(ci =>
      math.round(math.sqrt(math.max(evals(ci), 0.0)) * 1e6)).toArray
    Model(n, dim, sums, loadings, sig,
      order.map(evals(_)).toArray)
  }
}
