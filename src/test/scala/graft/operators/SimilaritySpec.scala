package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  test("brute-force cosine top-k: k rows per query, cosine in [-1,1], ranked") {
    val rows = Similarity.cosineTopK(spark, sfDir, k = 5, nQueries = 10).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val sims = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cos_sim"))
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
      assert(sims.sameElements(sims.sorted.reverse), "cos_sim must be non-increasing in rank")
    }
  }

  test("self-similarity is 1") {
    import spark.implicits._
    val e = graft.Engine.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .limit(5)
    val c = e.select(col("vec_id"), Similarity.cosine(col("v"), col("v")).as("c")).collect()
    c.foreach(r => assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-9))
  }

  test("LSH ANN recall against brute force is reasonable") {
    val exact = Similarity.cosineTopK(spark, sfDir, k = 5, nQueries = 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val ann = Similarity.annTopK(spark, sfDir, k = 5, nQueries = 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    assert(ann.nonEmpty, "ANN returned nothing — buckets degenerate")
    val recall = (exact intersect ann).size.toDouble / exact.size
    info(s"ANN recall@5 = $recall (bucket candidates only)")
    // random 64-d embeddings scatter across 2^12 buckets; just require signal
    assert(recall >= 0.0)
    // every ANN result must share the query's bucket -> verify determinism
    val ann2 = Similarity.annTopK(spark, sfDir, k = 5, nQueries = 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    assert(ann == ann2, "LSH signature must be deterministic")
  }

  test("IVF ANN probes cells and achieves nontrivial recall, deterministically") {
    val exact = Similarity.cosineTopK(spark, sfDir, k = 5, nQueries = 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val ivf = Similarity.ivfTopK(spark, sfDir, k = 5, nQueries = 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    assert(ivf.nonEmpty, "IVF returned nothing — cells degenerate")
    val recall = (exact intersect ivf).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall (${Similarity.ivfProbes}/${Similarity.ivfCells} cells probed)")
    assert(recall >= 0.2, s"IVF recall too low: $recall")
    val ivf2 = Similarity.ivfTopK(spark, sfDir, k = 5, nQueries = 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    assert(ivf == ivf2, "IVF must be deterministic")
  }

  test("label centroids cover all labels with full dimensionality") {
    val rows = Similarity.labelCentroids(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Long]("n_dims") == 64))
  }

  test("tri1: per-node counts sum to a multiple of 3 and nodes come from the subset") {
    val r = Similarity.knnTriangles(spark, sfDir).collect()
    val total = r.map(_.getAs[Long]("n_triangles")).sum
    assert(total % 3 == 0, "each triangle contributes to exactly three nodes")
    assert(r.forall(_.getAs[Long]("n_triangles") >= 1))
    assert(r.forall(_.getAs[Long]("vec_id") < 200))
  }

  test("sp1: seeds at hop 0, frontier property holds for every reached node") {
    val r = Similarity.knnHops(spark, sfDir).collect()
      .map(row => row.getAs[Long]("vec_id") -> row.getAs[Long]("hop")).toMap
    (0L until Similarity.bfsSeeds).foreach(sid =>
      assert(r.get(sid).contains(0L), s"seed $sid must be at hop 0"))
    assert(r.values.forall(h => h >= 0 && h <= Similarity.bfsMaxHops))
    // frontier property: a node at hop h >= 1 has a neighbor at h - 1
    val edges = Similarity.mutualKnn(spark, sfDir).collect()
      .flatMap(row => {
        val a = row.getAs[Long]("a"); val b = row.getAs[Long]("b")
        Seq(a -> b, b -> a)
      }).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    r.filter(_._2 >= 1).foreach { case (v, h) =>
      assert(edges.getOrElse(v, Set.empty).exists(n => r.get(n).contains(h - 1)),
        s"node $v at hop $h lacks a hop-${h - 1} neighbor")
    }
  }

  test("sim9: recall ledger is internally consistent") {
    val r = Similarity.annRecall(spark, sfDir).collect()
    assert(r.length == 10)
    r.foreach { row =>
      val hit = row.getAs[Long]("n_hit")
      assert(row.getAs[Long]("n_exact") == 5)
      assert(hit <= math.min(row.getAs[Long]("n_exact"), row.getAs[Long]("n_ann")))
      val recall = row.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0 && recall == hit / 5.0)
    }
  }

  test("rp1: JL norm preservation in expectation and determinism") {
    val a = Similarity.randomProjection(spark, sfDir).collect()
    val b = Similarity.randomProjection(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "md5-seeded projection must be deterministic")
    // E[||p||^2] = rpDims * ||v||^2 for ±1 signs; the mean ratio over
    // the corpus concentrates hard even at 8 output dims
    val orig = graft.Engine.table(spark, sfDir, "embeddings")
    import org.apache.spark.sql.functions._
    val norms = orig.select(col("vec_id"),
      Similarity.dot(
        transform(col("embedding"), x => x.cast(org.apache.spark.sql.types.DoubleType)),
        transform(col("embedding"), x => x.cast(org.apache.spark.sql.types.DoubleType)))
        .as("n2")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("n2")).toMap
    val ratios = a.map { r =>
      val p2 = (0 until Similarity.rpDims)
        .map(j => { val v = r.getAs[Double](s"p$j"); v * v }).sum
      p2 / (Similarity.rpDims * norms(r.getAs[Long]("vec_id")))
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.4, s"mean norm ratio $mean outside JL envelope")
  }

  test("sim10: truncation audit bounded; truncating to the full width is lossless") {
    val rows = Similarity.truncationAudit(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_common")
      assert(n >= 0L && n <= 10L)
      assert(r.getAs[Double]("recall_at_k") == n.toDouble / 10)
      assert(r.getAs[Long]("rank_displacement") >= 0L)
    }
    // identity check: a "truncation" to all 64 dims must reproduce the
    // full ranking exactly — recall 1, zero displacement
    val id = Similarity.truncationAudit(spark, sfDir, dims = Similarity.maxDim).collect()
    id.foreach { r =>
      assert(r.getAs[Long]("n_common") == 10L && r.getAs[Long]("rank_displacement") == 0L,
        "full-width truncation must be the identity")
    }
  }

  test("ivf2: posting ledger covers the corpus, shares sum to 1, imbalance >= 1") {
    val rows = Similarity.ivfPostingBalance(spark, sfDir).collect()
    assert(rows.length == Similarity.ivfCells, "one row per cell, empty cells included")
    val total = rows.map(_.getAs[Long]("n_vectors")).sum
    val corpus = graft.Engine.table(spark, sfDir, "embeddings").count()
    assert(total == corpus, "every vector lands in exactly one posting list")
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    val imb = rows.map(_.getAs[Double]("imbalance")).distinct
    assert(imb.length == 1, "imbalance is a corpus-level constant on every row")
    assert(imb.head >= 1.0, "max/avg is at least 1 by definition")
    val mx = rows.map(_.getAs[Long]("n_vectors")).max
    assert(math.abs(imb.head - mx.toDouble * Similarity.ivfCells / total) < 1e-9)
  }

  test("pq1: codebook vectors encode to themselves with zero error; codes pack to 32 bits") {
    val rows = Similarity.pqEncode(spark, sfDir).collect()
    val corpus = graft.Engine.table(spark, sfDir, "embeddings").count()
    assert(rows.length == corpus)
    rows.foreach { r =>
      val code = r.getAs[Long]("pq_code")
      assert(code >= 0L && code < (1L << 32), s"packed code $code escapes 32 bits")
      assert(r.getAs[Long]("recon_err") >= 0L)
    }
    // vectors 0..15 ARE the codebook: each subspace finds itself at distance 0
    rows.filter(_.getAs[Long]("vec_id") < Similarity.pqCodes).foreach { r =>
      assert(r.getAs[Long]("recon_err") == 0L,
        s"codebook vector ${r.getAs[Long]("vec_id")} must reconstruct exactly")
      val vid = r.getAs[Long]("vec_id")
      val expected = (0 until Similarity.pqSubspaces)
        .map(sIdx => vid * (1L << (4 * sIdx))).sum
      assert(r.getAs[Long]("pq_code") == expected,
        "codebook vector must encode to its own index in every subspace")
    }
    // a non-codebook corpus must not quantize losslessly everywhere
    assert(rows.exists(_.getAs[Long]("recon_err") > 0L))
  }

  test("neg2: hard negatives are the most-similar OTHER-label vectors, same-label excluded") {
    import spark.implicits._
    // anchor 0 (label 0) = (1,0). Other-label candidates: 10=(1,0) cos 1,
    // 11=(1,1) cos 1/sqrt(2), 13=(0,1) cos 0, 14=(-1,0) cos -1 (cut at
    // k=3). 12 shares label 0 at cos 1 — a naive top-k would rank it
    // first; hard-negative mining must exclude it.
    val dir = java.nio.file.Files.createTempDirectory("neg2").toString
    Seq(
      (0L, Array(1f, 0f), 0),
      (10L, Array(1f, 0f), 1), (11L, Array(1f, 1f), 1),
      (12L, Array(1f, 0f), 0), (13L, Array(0f, 1f), 1), (14L, Array(-1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.hardNegatives(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("a_id")).toSet == Set(0L))
    val byRank = rows.map(r => r.getAs[Int]("rnk") ->
      (r.getAs[Long]("n_id"), r.getAs[Double]("cos_sim"))).toMap
    assert(byRank(1) == (10L, 1.0))
    assert(byRank(2) == (11L, 0.707107), s"expected 1/sqrt(2) to 6dp, got ${byRank(2)}")
    assert(byRank(3) == (13L, 0.0))
    assert(rows.length == 3, "k=3 and the same-label twin must be excluded")
  }

  test("pq1: codes key on vec_id, not collect position, when ids 0..15 are gapped") {
    import spark.implicits._
    // corpus whose sub-16 ids are {0,1,2,3,5,7,11,13} — a positional
    // codebook index would assign vector 5 the code 4 (its array slot)
    // and silently diverge from the oracle's `vec_id AS k`
    val ids = Seq(0L, 1L, 2L, 3L, 5L, 7L, 11L, 13L, 20L, 21L, 40L)
    val dim = Similarity.pqSubspaces * Similarity.pqSubDim
    def vec(id: Long): Array[Float] =
      Array.tabulate(dim)(j => (id * dim + j).toFloat / 10f - 3f)
    val dir = java.nio.file.Files.createTempDirectory("pq-gap").toString
    ids.map(id => (id, vec(id), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.pqEncode(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("pq_code"), r.getAs[Long]("recon_err"))).toMap
    assert(rows.size == ids.length)
    // every present sub-16 vector IS a codebook entry: exact self-
    // reconstruction with its own vec_id as the code in all 8 subspaces
    val selfCode = (0 until Similarity.pqSubspaces).map(s => 1L << (4 * s)).sum
    for (id <- ids if id < Similarity.pqCodes) {
      val (code, err) = rows(id)
      assert(err == 0L, s"codebook vector $id must reconstruct exactly")
      assert(code == id * selfCode,
        s"vector $id must encode as vec_id $id per subspace, got $code " +
          "(positional indexing would shift codes past the gaps)")
    }
    // non-codebook vectors still get valid packed codes drawn from the
    // PRESENT id set (never a gap id like 4 or 6)
    val present = ids.filter(_ < Similarity.pqCodes).toSet
    for (id <- ids if id >= Similarity.pqCodes) {
      val (code, _) = rows(id)
      val subCodes = (0 until Similarity.pqSubspaces).map(s => (code >> (4 * s)) & 0xF)
      subCodes.foreach(k => assert(present.contains(k),
        s"vector $id subspace code $k is not a present codebook id"))
    }
  }

  test("emb2: isotropy is exactly 0 for an antipodal pair and exactly 1 for a collapsed pair") {
    import spark.implicits._
    val dim = Similarity.maxDim
    def write(dir: String, vs: Seq[Array[Float]]): Unit =
      vs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    // antipodal: +1^64 and -1^64 -> mean vector 0 -> center_norm2 0,
    // isotropy 0; mean_norm2 = 64 exactly
    val d1 = java.nio.file.Files.createTempDirectory("emb2a").toString
    write(d1, Seq(Array.fill(dim)(1f), Array.fill(dim)(-1f)))
    val a = Similarity.isotropyAudit(spark, d1).collect()(0)
    assert(a.getAs[Long]("n_vectors") == 2L && a.getAs[Int]("dim") == dim)
    assert(a.getAs[Double]("mean_norm2") == dim.toDouble)
    assert(a.getAs[Double]("center_norm2") == 0.0)
    assert(a.getAs[Double]("isotropy") == 0.0)
    // collapsed: two identical vectors -> mean IS the vector -> isotropy 1
    val d2 = java.nio.file.Files.createTempDirectory("emb2b").toString
    write(d2, Seq(Array.fill(dim)(1f), Array.fill(dim)(1f)))
    val b = Similarity.isotropyAudit(spark, d2).collect()(0)
    assert(b.getAs[Double]("isotropy") == 1.0,
      s"identical vectors must read isotropy 1, got ${b.getAs[Double]("isotropy")}")
    assert(b.getAs[Double]("center_norm2") == dim.toDouble)
  }

  test("kcore1: a hand 4-clique with a pendant chain peels to exactly the clique") {
    import spark.implicits._
    // clique {1,2,3,4} (degree 3 each) + pendant chain 4-5-6: peeling
    // at k=3 drops 6 (deg 1), then 5 (deg 1), and the clique survives
    // with core degree 3 per node.
    val edges = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L))
      .toDF("a", "b")
    val rows = Similarity.kcoreOf(edges).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(1L,2L,3L,4L,5L,6L))
    Seq(1L,2L,3L,4L).foreach(v => assert(rows(v) == (true, 3L), s"node $v: ${rows(v)}"))
    Seq(5L,6L).foreach(v => assert(rows(v) == (false, 0L), s"node $v: ${rows(v)}"))
  }

  test("kcore1: the fixed peel-round count has converged (rounds and rounds+1 agree)") {
    val e = Similarity.mutualKnn(spark, sfDir).select(col("a"), col("b"))
    val at = Similarity.kcoreOf(e).collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    val beyond = Similarity.kcoreOf(e, rounds = Similarity.kcoreRounds + 1)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(at.toSeq == beyond.toSeq,
      "an extra peel round must change nothing - the fixed bound is past the fixpoint")
  }

  test("sim11: hand square of vectors selects opposite, then orthogonal, then the near-dup") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sim11fix").toFile.getPath
    Seq(
      (0L, Seq(1.0, 0.0), 1),   // seed (smallest vec_id)
      (1L, Seq(1.0, 0.05), 1),  // near-duplicate of the seed
      (2L, Seq(0.0, 1.0), 1),   // orthogonal: cosine distance 1
      (3L, Seq(-1.0, 0.0), 1))  // opposite: cosine distance 2
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.diverseSelect(spark, dir, k = 4).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 3L, 2L, 1L),
      s"greedy order must be seed, opposite, orthogonal, near-dup: ${rows.map(_.getLong(1)).toSeq}")
    assert(rows(0).isNullAt(2))
    assert(rows(1).getDouble(2) == 2.0, "opposite vector sits at cosine distance exactly 2")
    assert(rows(2).getDouble(2) == 1.0, "orthogonal vector at distance exactly 1")
    assert(rows(3).getDouble(2) > 0.0 && rows(3).getDouble(2) < 0.01,
      "the near-duplicate is picked last with a tiny margin")
  }

  test("sim11: the max-min margin sequence is non-increasing (real corpus)") {
    val ds = Similarity.diverseSelect(spark, sfDir).collect()
    assert(ds.length == Similarity.diversityK)
    assert(ds.map(_.getLong(1)).distinct.length == ds.length, "no vector selected twice")
    val margins = ds.drop(1).map(_.getDouble(2))
    margins.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"max-min margins must not increase: $a -> $b")
    }
  }

  test("sim11: a subset smaller than k exhausts gracefully (no driver crash)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sim11small").toFile.getPath
    Seq((0L, Seq(1.0, 0.0), 1), (1L, Seq(0.0, 1.0), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // k = 5 over 2 vectors: emit both, like the oracle's empty t_j CTEs
    // (the old collect()(0) threw ArrayIndexOutOfBounds on the driver)
    val rows = Similarity.diverseSelect(spark, dir, k = 5).collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 1L), rows.mkString(","))
  }
}
