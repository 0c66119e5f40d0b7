package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Spec-bounded contract for the PCA tier (no DuckDB eigensolver, so
  * cov1 is the oracle-checked piece and these invariants pin the rest).
  */
class PcaSpec extends SparkTestBase {

  private lazy val moments = Similarity.embeddingCovariance(spark, sfDir)
  private lazy val (mean, cov) = Pca.covariance(moments)
  private lazy val d = mean.length
  private lazy val (values, vectors) = Pca.jacobiEigen(cov)

  test("jacobi annihilates pairs with equal diagonal entries (theta == 0)") {
    // [[2,1],[1,2]] has eigenvalues {3,1}; signum(0) = 0 would leave it
    // unrotated and return {2,2}
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) <= 1e-12 && math.abs(vals(1) - 1.0) <= 1e-12,
      vals.mkString(","))
    val s = 1.0 / math.sqrt(2.0)
    assert(vecs(0).map(math.abs).forall(x => math.abs(x - s) <= 1e-12))
  }

  test("covariance is symmetric with nonnegative diagonal") {
    assert(d == 64)
    for (i <- 0 until d) assert(cov(i)(i) >= -1e-12)
    for (i <- 0 until d; j <- 0 until d) assert(cov(i)(j) == cov(j)(i))
  }

  test("eigenvalues are descending and the trace is preserved") {
    values.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-12) }
    assert(values.forall(_ >= -1e-9), "covariance must be PSD")
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(values.sum - trace) <= 1e-8 * math.max(1.0, math.abs(trace)))
  }

  test("eigenvector basis is orthonormal") {
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => vectors(i)(k) * vectors(j)(k)).sum
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expected) <= 1e-8, s"basis rows $i,$j dot=$dot")
    }
  }

  test("eigendecomposition reconstructs the covariance") {
    // cov = V^T diag(values) V with V rows = eigenvectors
    for (i <- 0 until d; j <- 0 until d) {
      val r = (0 until d).map(k => values(k) * vectors(k)(i) * vectors(k)(j)).sum
      assert(math.abs(r - cov(i)(j)) <= 1e-7,
        s"reconstruction off at ($i,$j): $r vs ${cov(i)(j)}")
    }
  }

  test("projected component variance matches its eigenvalue, components uncorrelated") {
    val k = 4
    val model = Pca.fit(moments, k)
    val proj = Pca.project(
      graft.Engine.table(spark, sfDir, "embeddings"), "vec_id", "embedding", model)
    assert(proj.columns.toSeq == "vec_id" +: (0 until k).map(i => s"pc$i"))
    val rows = proj.collect()
    val n = rows.length.toDouble
    for (c <- 0 until k) {
      val xs = rows.map(_.getDouble(c + 1))
      val m = xs.sum / n
      // population variance, matching the covariance construction
      val v = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(v - model.eigenvalues(c)) <= 1e-6 * math.max(1.0, model.eigenvalues(c)),
        s"pc$c variance $v vs eigenvalue ${model.eigenvalues(c)}")
    }
    // distinct components are uncorrelated in the projected space
    val xs0 = rows.map(_.getDouble(1)); val xs1 = rows.map(_.getDouble(2))
    val (m0, m1) = (xs0.sum / n, xs1.sum / n)
    val cross = xs0.zip(xs1).map { case (a, b) => (a - m0) * (b - m1) }.sum / n
    assert(math.abs(cross) <= 1e-6)
  }

  test("project drops vectors whose length differs from the model dimension") {
    import spark.implicits._
    val k = 2
    val model = Pca.fit(moments, k)
    val ragged = Seq(
      (1L, Array.fill(d)(0.5f)),
      (2L, Array.fill(d - 1)(0.5f)), // short: zip_with would null-pad and
      (3L, Array.fill(d + 3)(0.5f))) // DotProduct read the nulls as 0.0
      .toDF("vec_id", "embedding")
    val out = Pca.project(ragged, "vec_id", "embedding", model).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L),
      "only the full-dimension vector may project; a silent mean-fill is worse than a drop")
  }
}
