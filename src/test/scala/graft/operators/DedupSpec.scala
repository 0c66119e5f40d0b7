package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  test("connected components labels every node with its cluster minimum (both paths)") {
    import spark.implicits._
    // two chains and a singleton-edge: {1-2-3-4}, {10-11}, {20-21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L)
    val unionFind = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unionFind == expected)
    // force the distributed label-propagation path
    val distributed = Dedup.connectedComponents(pairs, driverThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == expected)
  }

  test("dedup keep-list covers every document with consistent verdicts") {
    val rows = Dedup.dedupKeepList(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val keep = r.getBoolean(1)
      val reason = if (r.isNullAt(2)) None else Some(r.getString(2))
      assert(keep == reason.isEmpty, s"doc ${r.getLong(0)}: keep=$keep but reason=$reason")
    }
    assert(rows.exists(_.getBoolean(1)), "some documents must be kept")
  }

  test("duplicate clusters are consistent: canonical id is in the same cluster and minimal") {
    val rows = Dedup.duplicateClusters(spark, sfDir).collect()
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (canon, members) =>
      assert(members.map(_.getLong(0)).min == canon,
        s"canonical $canon must be the min doc_id of its cluster")
    }
  }

  test("exact dedup groups by normalized content hash") {
    val out = Dedup.exactDedup(spark, sfDir).collect()
    assert(out.length > 0)
    // synthetic corpus has no exact dupes: every group has one member
    assert(out.forall(_.getAs[Long]("n_copies") >= 1))
    val total = out.map(_.getAs[Long]("n_copies")).sum
    assert(total == graft.Engine.table(spark, sfDir, "documents").count())
  }

  test("minhash estimate tracks exact jaccard on LSH candidates") {
    val est = Dedup.minhashEstimate(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    // exact jaccard for all pairs sharing >= 1 shingle (superset of LSH candidates)
    val sh = Dedup.shingles(spark, sfDir)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val exact = a.join(b, "shingle").filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard", col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val joined = est.join(exact, Seq("doc_a", "doc_b"), "left").collect()
    assert(joined.nonEmpty, "LSH produced no candidate pairs")
    joined.foreach { r =>
      val e = r.getAs[Double]("est_jaccard")
      val j = Option(r.getAs[Any]("jaccard")).map(_.asInstanceOf[Double]).getOrElse(0.0)
      // k=64 minhash: standard error ~ sqrt(j(1-j)/64) <= 0.0625; allow 4 sigma
      assert(math.abs(e - j) <= 0.25, s"pair (${r.get(0)},${r.get(1)}): est=$e exact=$j")
    }
  }

  test("simhash of identical documents is identical, distance 0") {
    import spark.implicits._
    val docs = Seq((1L, "spark table row scan filter"), (2L, "spark table row scan filter"),
      (3L, "completely different words entirely unrelated")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_tmp")
    // reuse signature logic over a temp dir is awkward; compute inline instead
    val sigs = Dedup.simhashSignatures(spark, sfDir).limit(0) // type check only
    val toks = docs.select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i")
    }
    val sig = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map { i =>
          when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)
        }.reduce(_.bitwiseOR(_)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) > 8)
  }

  test("simhash pair search returns low-hamming candidates ordered by distance") {
    val pairs = Dedup.simhashPairs(spark, sfDir).collect()
    val dists = pairs.map(_.getAs[Int]("hamming"))
    assert(dists.sameElements(dists.sorted))
    assert(dists.forall(d => d >= 0 && d <= 16))
  }

  test("ngram jaccard pairs are symmetric-deduped and thresholded") {
    val rows = Dedup.ngramJaccard(spark, sfDir).collect()
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(rows.forall(r => r.getAs[Double]("jaccard") >= 0.05))
  }

  test("embedding near-dup: LSH candidates, no cartesian, recall >= 0.95 vs all-pairs") {
    val lsh = Dedup.embeddingNearDup(spark, sfDir)
    // the registered query must never plan a cartesian / nested-loop join
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"dd5 planned a cross join:\n$plan")
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.embeddingNearDupAllPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), "LSH candidates produced a pair outside ground truth")
    val recall = got.size.toDouble / math.max(truth.size, 1)
    assert(recall >= 0.95, s"recall $recall (${got.size}/${truth.size})")
  }

  test("dd13: canonical URLs match hand-computed fixtures; verdicts are group minima") {
    val rows = Dedup.urlCanonicalDedup(spark, sfDir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // HAND-COMPUTED canonical forms (independent value anchor, not the
    // mirrored oracle). doc 0 hits EVERY variant class: https + www. +
    // mixed-case host + :443 + trailing slash + utm params + fragment —
    // canonicalization strips all of them, keeping only the ref param.
    assert(byId(0L).getString(1) == "docs.example.com/src0/0?ref=rss")
    // doc 1: http, plain host, no port/slash/fragment; ?ref=rss SURVIVES
    // (only utm_* params are stripped)
    assert(byId(1L).getString(1).endsWith("/1?ref=rss") &&
      byId(1L).getString(1).startsWith("docs.example.com/src"))
    // doc 2: bare variant — scheme stripped, nothing else to normalize
    assert(byId(2L).getString(1).matches("docs\\.example\\.com/src[0-9]+/2"))
    // no canonical form retains any artifact the chain should remove
    rows.foreach { r =>
      val u = r.getString(1)
      assert(!u.contains("://") && !u.startsWith("www.") && !u.contains("utm_") &&
        !u.contains("#") && !u.contains(":80") && !u.contains(":443") &&
        !u.endsWith("/") && !u.endsWith("?") && u == u.toLowerCase,
        s"doc ${r.getLong(0)}: residual artifact in $u")
    }
    // dedup semantics: keep iff minimal doc_id of the canonical group
    val groups = rows.groupBy(_.getString(1))
    assert(groups.values.exists(_.length > 1), "corpus must produce canonical collisions")
    groups.values.foreach { g =>
      val minId = g.map(_.getLong(0)).min
      g.foreach { r =>
        assert(r.getBoolean(3) == (r.getLong(0) == minId))
        assert(r.getLong(2) == g.length)
      }
    }
  }

  test("dd14: canonical-text tier collapses punctuation/case variants dd1 keeps apart") {
    val rows = Dedup.canonicalTextDedup(spark, sfDir).collect()
    assert(rows.length == 500)
    val groups = rows.groupBy(_.getString(1))
    groups.values.foreach { g =>
      val minId = g.map(_.getLong(0)).min
      g.foreach(r => assert(r.getBoolean(3) == (r.getLong(0) == minId) &&
        r.getLong(2) == g.length))
    }
    // the canonical tier can only MERGE dd1's whitespace-normalized
    // groups, never split them: distinct canonical hashes <= distinct
    // dd1 content hashes
    val dd1Groups = Dedup.exactDedup(spark, sfDir).count()
    assert(groups.size <= dd1Groups)
  }

  test("dd12: verdicts cover the batch, flags and drop_reason are consistent") {
    val rows = Dedup.incrementalDedup(spark, sfDir).collect()
    val batchSize = graft.Engine.table(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("source") === "src19").count()
    assert(rows.length == batchSize, "one verdict per batch document")
    rows.foreach { r =>
      val flags = Seq("exact_dup_corpus", "exact_dup_batch",
        "near_cand_corpus", "near_cand_batch").map(r.getAs[Boolean])
      val admit = r.getAs[Boolean]("admit")
      assert(admit == !flags.exists(identity),
        "admit must be the conjunction of the negated flags")
      val reason = Option(r.getAs[String]("drop_reason"))
      assert(reason.isEmpty == admit, "drop_reason iff not admitted")
      // severity order: the reason is the FIRST raised flag
      reason.foreach { rs =>
        val order = Seq("exact_vs_corpus", "exact_in_batch",
          "near_vs_corpus", "near_in_batch")
        assert(flags(order.indexOf(rs)), s"reason $rs without its flag")
        assert(!flags.take(order.indexOf(rs)).exists(identity),
          s"reason $rs but a more severe flag is raised")
      }
    }
    // set semantics: at least one batch doc must be admitted (the corpus
    // generator never emits a fully-duplicated source)
    assert(rows.exists(_.getAs[Boolean]("admit")))
  }

  test("fld2: no dedup cluster straddles folds (the leakage-safety invariant)") {
    val rows = Dedup.clusterSplit(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getInt(2) >= 0 && r.getInt(2) < Dedup.clusterFolds))
    // every cluster maps to exactly one fold
    rows.groupBy(_.getLong(1)).values.foreach { g =>
      assert(g.map(_.getInt(2)).distinct.length == 1,
        s"cluster ${g.head.getLong(1)} straddles folds")
    }
    val fold = rows.map(r => r.getLong(0) -> r.getInt(2)).toMap
    // exact duplicates can never split across folds
    val byHash = graft.Engine.table(spark, sfDir, "documents")
      .selectExpr("doc_id", "md5(regexp_replace(lower(text), '\\s+', ' ')) AS h")
      .collect().groupBy(_.getString(1))
    byHash.values.filter(_.length > 1).foreach { g =>
      assert(g.map(r => fold(r.getLong(0))).distinct.length == 1,
        "exact duplicates must share a fold")
    }
    // near-dup candidate pairs (dd8's edge threshold) share folds too
    Dedup.minhashLsh(spark, sfDir).filter(col("n_band_hits") >= 2).collect().foreach { r =>
      assert(fold(r.getLong(0)) == fold(r.getLong(1)),
        s"near-dup pair (${r.getLong(0)}, ${r.getLong(1)}) straddles folds")
    }
  }

  test("df-cap guard: fixture-corpus pair recall at the 0.05 threshold is unchanged") {
    // VERDICT r17 #3 done-bar: the guard must not move a single pair on
    // the fixture corpus (no shingle there approaches df=256; at scale
    // only ubiquitous, signal-free shingles are dropped)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val capped = pairs(Dedup.ngramJaccard(spark, sfDir))
    val uncapped = pairs(Dedup.ngramJaccardCapped(spark, sfDir, Int.MaxValue))
    assert(capped == uncapped, "df cap changed fixture pair recall")
    assert(capped.nonEmpty, "vacuous recall check: no pairs at all")
  }

  test("dfCapped drops exactly the over-cap posting lists; a stop shingle cannot fan out") {
    import spark.implicits._
    // shingle "hot" in 5 docs (over cap=3), "warm" in 3 (at cap), "cold"
    // in 2 — the guard must drop hot entirely and keep the rest intact
    val postings = ((1 to 5).map(d => (d.toLong, "hot")) ++
      (1 to 3).map(d => (d.toLong, "warm")) ++
      (1 to 2).map(d => (d.toLong, "cold"))).toDF("doc_id", "shingle")
    val kept = Dedup.dfCapped(postings.repartition(4, col("shingle")), "shingle", cap = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!kept.exists(_._2 == "hot"), "over-cap posting list must drop")
    assert(kept.count(_._2 == "warm") == 3 && kept.count(_._2 == "cold") == 2,
      s"at/under-cap postings must survive untouched: $kept")
    // the pair fan-out the guard exists for: 5 docs sharing only "hot"
    // would make C(5,2)=10 candidate pairs; with the guard the join
    // emits none of them
    val a = Dedup.dfCapped(postings.repartition(4, col("shingle")), "shingle", cap = 3)
    val fan = a.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(a.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
      .filter(col("doc_a") < col("doc_b"))
    assert(fan.count() == (3 * 2 / 2 + 1), // warm C(3,2)=3 + cold C(2,2)=1
      "guarded join must fan only the under-cap shingles")
  }

  test("dd19 audit row is internally consistent and ledgers the dd2-family cap") {
    val r = Dedup.dfCapAudit(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r(0)
    val (nSh, nCapped, nDropped, maxDf, cap) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    assert(cap == Dedup.postingDfCap.toLong)
    assert(nSh > 0 && maxDf >= 1)
    assert((nCapped == 0) == (maxDf <= cap), "capped count must agree with max df")
    assert(nDropped >= nCapped, "each capped shingle drops at least cap+1 postings")
  }
}
