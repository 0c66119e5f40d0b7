package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-side PCA over the distributed moment matrix (cov1 /
  * Similarity.embeddingCovariance).
  *
  * Division of labor at 100 TB: everything data-sized is distributed —
  * the moment matrix is one exchange that ships at most d(d+1)/2 rows
  * per partition, the projection is a map-only pass with the basis
  * broadcast as literals through the codegen'd DotProduct — while the
  * eigensolve runs on the driver over d x d doubles (d = 64 here; even
  * d = 4096 is 128 MB), the same bounded-driver-state tier as sim4's
  * IVF centroids. No oracle registration: DuckDB has no eigensolver, so
  * the contract is spec-bounded (orthonormal basis, descending
  * eigenvalues, trace preservation, projected variance = eigenvalue)
  * rather than hash-compared — PcaSpec.
  */
object Pca {

  /** Top-k principal components: per-dimension means, an orthonormal
    * basis (rows = components), and the matching covariance
    * eigenvalues, descending.
    */
  final case class Model(
      mean: Array[Double],
      basis: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** Mean vector + population (divide-by-n) covariance from cov1's
    * exact moment rows
    * (i <= j upper triangle; n, sum_xy, sum_x, sum_y per pair).
    */
  def covariance(moments: DataFrame): (Array[Double], Array[Array[Double]]) = {
    val rows = moments.select(
      col("i").cast(IntegerType), col("j").cast(IntegerType),
      col("n").cast(LongType), col("sum_xy"), col("sum_x"), col("sum_y")).collect()
    require(rows.nonEmpty, "empty moment matrix")
    val d = rows.iterator.map(_.getInt(1)).max + 1
    val mean = new Array[Double](d)
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, n) = (r.getInt(0), r.getInt(1), r.getLong(2).toDouble)
      val (sxy, sx, sy) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val c = sxy / n - (sx / n) * (sy / n)
      cov(i)(j) = c
      cov(j)(i) = c
      if (i == j) mean(i) = sx / n
    }
    (mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors as rows), sorted by eigenvalue
    * descending. O(d^3) per sweep on the driver — fine for the bounded
    * d this tier is reserved for.
    */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 50,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    // v starts as identity; accumulates the rotations (columns = eigenvectors)
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // theta == 0 (equal diagonal entries) takes the 45-degree
            // rotation: signum(0) = 0 would make this the identity and
            // the pair would never be annihilated
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
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
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray, order.map(i => v.map(_(i))).toArray)
  }

  /** Fit the top-k model from a cov1 moment DataFrame. */
  def fit(moments: DataFrame, k: Int): Model = {
    val (mean, cov) = covariance(moments)
    val (values, vectors) = jacobiEigen(cov)
    Model(mean, vectors.take(k), values.take(k))
  }

  /** Map-only projection: each embedding centered against the broadcast
    * mean and dotted with each basis row (codegen'd DotProduct). Output:
    * the id column plus pc0..pc{k-1}.
    *
    * Vectors whose length differs from the model dimension are DROPPED
    * (covariance() tolerates ragged corpora, so a shorter vector is
    * legal input here — but zip_with null-pads it and DotProduct reads
    * the null slots as 0.0, silently projecting the row as if its
    * missing coordinates equaled the mean; an explicit filter beats a
    * silently wrong pc).
    */
  def project(embeddings: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val meanLit = array(model.mean.map(lit): _*)
    val centered = zip_with(
      transform(col(vecCol), _.cast(DoubleType)), meanLit, (x, m) => x - m)
    val pcs: Seq[Column] = model.basis.zipWithIndex.map { case (b, i) =>
      graft.functions.VectorFunctions.vecDot(centered, array(b.map(lit): _*)).as(s"pc$i")
    }.toSeq
    embeddings
      .filter(size(col(vecCol)) === model.mean.length)
      .select(col(idCol) +: pcs: _*)
  }
}
