package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants for the round-10 operator additions (ev12 inter-arrival,
  * ev13 RFM, prof2 correlation matrix, txt13 char classes, hist1 token
  * histogram, red1 PII scan, srch1 BM25, mm5 payload dedup, km1 k-means
  * assignment). Value-level correctness is hash-checked against the
  * DuckDB oracle by the driver gate; these pin the structural properties
  * the oracle compare can't express.
  */
class PipelineOpsSpec extends SparkTestBase {

  test("ev12: gap counts reconcile; min <= avg <= max") {
    val ia = Relational.interArrival(spark, sfDir).cache()
    val ev = graft.Engine.table(spark, sfDir, "events")
    // per type, #gaps = #events - #(user, type) sequences
    val expected = ev.groupBy(col("event_type"))
      .agg((count(lit(1)) - countDistinct(col("user_id"))).as("exp_gaps"))
    val off = ia.join(expected, "event_type").filter(col("n_gaps") =!= col("exp_gaps"))
    assert(off.isEmpty, off.collect().mkString(","))
    assert(ia.filter(col("min_gap_us") > col("avg_gap_us") ||
      col("avg_gap_us") > col("max_gap_us")).isEmpty)
    assert(ia.filter(col("min_gap_us") < 0).isEmpty, "events are time-ordered per user")
    ia.unpersist()
  }

  test("ev13: one row per user; scores in 1..4 and the code composes them") {
    val rfm = Relational.userRfm(spark, sfDir).cache()
    val users = graft.Engine.table(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(rfm.count() == users)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      assert(rfm.filter(col(c) < 1 || col(c) > 4).isEmpty, c)
    }
    assert(rfm.filter(col("rfm_code") =!=
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))).isEmpty)
    assert(rfm.filter(col("recency_days") < 0).isEmpty,
      "recency is measured from the corpus max timestamp")
    rfm.unpersist()
  }

  test("prof2: six upper-triangle pairs, corr in [-1,1], matches built-in corr") {
    val m = Relational.corrMatrix(spark, sfDir).cache()
    assert(m.count() == 6)
    assert(m.filter(col("corr") < -1.0 || col("corr") > 1.0).isEmpty)
    // cross-check one cell against Spark's own streaming corr (float
    // merge order differs, hence tolerance, not equality)
    val builtin = graft.Engine.table(spark, sfDir, "lineitem")
      .agg(corr(col("l_quantity"), col("l_extendedprice"))).collect()(0).getDouble(0)
    val exact = m.filter(col("column_x") === "l_quantity" &&
      col("column_y") === "l_extendedprice").collect()(0).getAs[Double]("corr")
    assert(math.abs(builtin - exact) < 1e-4, s"$builtin vs $exact")
    m.unpersist()
  }

  test("txt13: class counts partition within the character budget") {
    val cc = TextAnalysis.docCharClasses(spark, sfDir).cache()
    // digits/upper/space/punct are disjoint classes: their sum never
    // exceeds the length (lowercase letters are the remainder)
    assert(cc.filter(col("n_digits") + col("n_upper") + col("n_space") + col("n_punct")
      > col("n_chars")).isEmpty)
    Seq("digit_frac", "upper_frac", "punct_frac").foreach { c =>
      assert(cc.filter(col(c) < 0.0 || col(c) > 1.0).isEmpty, c)
    }
    cc.unpersist()
  }

  test("hist1: buckets cover the corpus exactly and edges are consistent") {
    val hist = TextAnalysis.tokenHistogram(spark, sfDir).cache()
    val total = hist.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(total == graft.Engine.table(spark, sfDir, "documents").count())
    assert(hist.filter(col("bucket") < 0 || col("bucket") > 8).isEmpty)
    assert(hist.filter(col("lo_tokens") =!= col("bucket") * 16).isEmpty)
    assert(hist.filter(col("bucket") < 8 && col("hi_tokens") =!= (col("bucket") + 1) * 16).isEmpty)
    hist.unpersist()
  }

  test("red1: has_pii mirrors the counts; clean docs keep their length") {
    val pii = TextAnalysis.docPiiScan(spark, sfDir).cache()
    assert(pii.filter(col("has_pii") =!=
      ((col("n_emails") + col("n_phones") + col("n_ips")) > 0)).isEmpty)
    val docs = graft.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).as("orig_len"))
    // lower() preserves length, so an unredacted doc's length is unchanged
    val clean = pii.filter(!col("has_pii")).join(docs, "doc_id")
    assert(clean.filter(col("redacted_len") =!= col("orig_len")).isEmpty)
    pii.unpersist()
  }

  test("srch1: scores positive and ranked, term matches within the query size") {
    val top = TextAnalysis.bm25TopDocs(spark, sfDir).collect()
    assert(top.nonEmpty && top.length <= 50)
    assert(top.forall(r => r.getAs[Long]("score_m") > 0))
    assert(top.forall { r =>
      val m = r.getAs[Long]("n_terms_matched"); m >= 1 && m <= 5
    })
    // descending by score with doc_id tiebreak
    val scores = top.map(r => (r.getAs[Long]("score_m"), r.getAs[Long]("doc_id")))
    assert(scores.sliding(2).forall {
      case Array((s1, d1), (s2, d2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
  }

  test("srch2: RRF scores decompose into their rank terms; fused list is ranked") {
    val rows = TextAnalysis.hybridRetrieval(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 10, "top-10 fused list per query")
      rs.foreach { r =>
        val lex = Option(r.getAs[Integer]("lex_rnk")).map(_.toInt)
        val den = Option(r.getAs[Integer]("dense_rnk")).map(_.toInt)
        assert(lex.isDefined || den.isDefined,
          "a fused row must come from at least one ranking")
        val expected = lex.map(x => 1.0 / (x + 60)).getOrElse(0.0) +
          den.map(x => 1.0 / (x + 60)).getOrElse(0.0)
        assert(r.getAs[Double]("rrf_score") == expected,
          "score must be exactly the sum of its reciprocal-rank terms")
      }
      val ordered = rs.sortBy(_.getAs[Int]("rrf_rank"))
      val scores = ordered.map(_.getAs[Double]("rrf_score"))
      assert(scores.sameElements(scores.sorted.reverse),
        "rrf_rank must be non-increasing in score")
      // a doc present in BOTH rankings outranks the same positions alone
      assert(scores.head >= 1.0 / 61, "rank-1 doc scores at least a single top term")
    }
  }

  test("tok4: coverage is monotone in vocab size and clamps to 1 at full vocabulary") {
    val rows = TextAnalysis.coverageCurve(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("vocab_size"))
    assert(rows.length == 5)
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.forall(c => c > 0.0 && c <= 1.0))
    assert(cov.zip(cov.tail).forall { case (a, b) => b >= a },
      "a larger vocabulary cannot cover less mass")
    val nv = rows.head.getAs[Long]("n_vocab_total")
    rows.filter(_.getAs[Long]("vocab_size") >= nv).foreach { r =>
      assert(r.getAs[Double]("coverage") == 1.0,
        "sizes beyond the actual vocabulary must clamp to full coverage")
    }
  }

  test("qf3: decile bands partition the corpus, keep == middle band") {
    val rows = TextAnalysis.perplexityFilter(spark, sfDir).collect()
    val total = graft.Engine.table(spark, sfDir, "documents").count()
    assert(rows.length == total, "one verdict per document")
    rows.foreach { r =>
      val d = r.getAs[Int]("decile")
      assert(d >= 0 && d <= 9)
      val band = r.getAs[String]("band")
      val expected = if (d < 2) "head" else if (d >= 8) "tail" else "middle"
      assert(band == expected)
      assert(r.getAs[Boolean]("keep") == (band == "middle"))
    }
    // deciles are balanced within one doc
    val sizes = rows.groupBy(_.getAs[Int]("decile")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, "histogram rank must produce exact deciles")
    // the middle band keeps 60% of the corpus
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(math.abs(kept - total * 6 / 10) <= 10)
  }

  test("cur1: three balanced phases cover the corpus, easy to hard") {
    val rows = TextAnalysis.curriculumPhases(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("phase"))
    assert(rows.map(_.getAs[Int]("phase")).toSeq == Seq(0, 1, 2))
    val total = graft.Engine.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "phases must partition the corpus")
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, "terciles must be balanced within one doc")
    // curriculum order: easier (higher Flesch) phases come first
    val maxes = rows.map(_.getAs[Double]("max_score"))
    assert(maxes.sameElements(maxes.sorted.reverse),
      "phase difficulty must be monotone")
    rows.foreach(r =>
      assert(r.getAs[Double]("min_score") <= r.getAs[Double]("max_score")))
  }

  test("mm5: the dedup map covers every payload exactly once") {
    val dedup = Multimodal.payloadDedup(spark, sfDir).cache()
    val nDocs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(dedup.agg(sum(col("n_copies"))).collect()(0).getLong(0) == nDocs)
    assert(dedup.filter(col("n_copies") < 1).isEmpty)
    assert(dedup.select(col("payload_md5")).distinct().count() == dedup.count())
    dedup.unpersist()
  }

  test("ev14: sentinels agree; waits are non-negative; forward of ev4") {
    val nxt = AsOf.eventAsofNextPurchase(spark, sfDir).cache()
    assert(nxt.filter((col("next_purchase_value") === -1.0) =!= (col("wait_us") === -1L)).isEmpty,
      "value and wait sentinels must agree")
    assert(nxt.filter(col("wait_us") < -1L).isEmpty)
    // view count preserved (left join semantics)
    val views = graft.Engine.table(spark, sfDir, "events")
      .filter(col("event_type") === "view").count()
    assert(nxt.count() == views)
    nxt.unpersist()
  }

  test("span2: boiler counts bounded by span counts; covers exactly the shingled docs") {
    val bf = TextAnalysis.boilerplateFraction(spark, sfDir).cache()
    assert(bf.filter(col("n_boiler") > col("n_spans")).isEmpty)
    assert(bf.filter(col("boilerplate_frac") < 0.0 || col("boilerplate_frac") > 1.0).isEmpty)
    val shingled = graft.Engine.table(spark, sfDir, "documents")
      .filter(size(TextAnalysis.tokens(col("text"))) >= 5).count()
    assert(bf.count() == shingled, "one row per document that has at least one 5-gram")
    bf.unpersist()
  }

  test("zipf1: slope is negative and the fit covers the requested terms") {
    val row = TextAnalysis.zipfSlope(spark, sfDir).collect()(0)
    val slope = row.getAs[Double]("zipf_slope")
    assert(slope < 0.0, s"rank-frequency slope must fall, got $slope")
    val terms = row.getAs[Long]("n_terms")
    assert(terms > 10 && terms <= 100)
  }

  test("pr1: rank mass conserves and in-degrees total k per node") {
    val k = 5
    val pr = Similarity.pageRank(spark, sfDir, k).cache()
    val nVecs = pr.count()
    // no dangling nodes (every node emits exactly k edges), so total
    // mass stays (1-d) + d = 1, up to the per-edge nanos rounding
    val mass = pr.agg(sum(col("pagerank"))).collect()(0).getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-5, s"mass $mass")
    val inSum = pr.agg(sum(col("n_in"))).collect()(0).getLong(0)
    assert(inSum == k * nVecs, s"$inSum vs ${k * nVecs}")
    assert(pr.filter(col("pagerank") <= 0.0).isEmpty)
    pr.unpersist()
  }

  test("km1: memberships cover the corpus; every seed stays in its own cluster") {
    val k = 8
    val km = Similarity.kmeansAssign(spark, sfDir, k).cache()
    val nVecs = graft.Engine.table(spark, sfDir, "embeddings").count()
    assert(km.agg(sum(col("n_members"))).collect()(0).getLong(0) == nVecs)
    assert(km.filter(col("cluster") < 0 || col("cluster") >= k).isEmpty)
    // a seed's cosine with itself is 1.0 — the maximum — so every seed
    // cluster is non-empty and its max similarity is 1 => avg <= 1
    assert(km.count() == k, "all seed clusters non-empty")
    assert(km.filter(col("min_cos") > col("avg_cos") || col("avg_cos") > 1.0).isEmpty)
    km.unpersist()
  }

  test("km2: in-row argmax agrees with km1's window assignment; d rows per cluster") {
    val k = 8
    val up = Similarity.kmeansUpdate(spark, sfDir, k).cache()
    assert(up.count() == k * 64L, "k clusters x 64 dims")
    // the same cluster size repeats on every dimension row
    assert(up.groupBy(col("cluster")).agg(countDistinct(col("n_members")).as("d"))
      .filter(col("d") =!= 1).isEmpty)
    // the two assignment formulations (window rnk=1 vs in-row argmax)
    // must produce identical cluster sizes
    val km1Sizes = Similarity.kmeansAssign(spark, sfDir, k)
      .select(col("cluster"), col("n_members"))
    val km2Sizes = up.filter(col("pos") === 0).select(col("cluster"), col("n_members"))
    assert(km1Sizes.except(km2Sizes).isEmpty && km2Sizes.except(km1Sizes).isEmpty,
      "km1 and km2 assignments diverge")
    up.unpersist()
  }

  test("sd1: verdict covers the corpus; cluster minima always survive") {
    val sd = Similarity.semDedup(spark, sfDir).cache()
    val nVecs = graft.Engine.table(spark, sfDir, "embeddings").count()
    assert(sd.count() == nVecs)
    assert(sd.filter(col("keep") =!= (col("n_close") === 0L)).isEmpty)
    // the lowest vec_id in a cluster has no lower-id mate to collide with
    val minIds = sd.groupBy(col("cluster")).agg(min(col("vec_id")).as("vec_id"))
    assert(sd.join(minIds, Seq("cluster", "vec_id")).filter(!col("keep")).isEmpty)
    // something must actually drop at the configured threshold, or the
    // operator is vacuous on this corpus
    assert(sd.filter(!col("keep")).count() > 0)
    sd.unpersist()
  }

  test("ts1: dense rectangular grid; event mass conserves through the gap-fill") {
    val g = Relational.hourlyGrid(spark, sfDir).cache()
    val ev = graft.Engine.table(spark, sfDir, "events")
    val nTypes = ev.select(col("event_type")).distinct().count()
    assert(g.count() % nTypes == 0, "every type spans the same hour range")
    assert(g.groupBy(col("event_type")).count()
      .select(countDistinct(col("count"))).collect()(0).getLong(0) == 1)
    assert(g.agg(sum(col("n_events"))).collect()(0).getLong(0) == ev.count(),
      "zero-fill must not invent or lose events")
    // consecutive grid rows are exactly one hour apart within a type
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("hour_us"))
    assert(g.withColumn("gap", col("hour_us") - lag(col("hour_us"), 1).over(w))
      .filter(col("gap").isNotNull && col("gap") =!= 3600000000L).isEmpty)
    g.unpersist()
  }

  test("rng1: boundaries are minimal, ordered cuts that honour their quantile targets") {
    val b = 16
    val rb = Relational.rangeBounds(spark, sfDir, b).cache()
    assert(rb.count() == b - 1)
    val n = graft.Engine.table(spark, sfDir, "orders").count()
    // each cut captures at least its target ceil(i*n/B)...
    assert(rb.filter(col("rows_below") <
      expr(s"(bucket * ${n}L + ${b - 1}) div $b")).isEmpty)
    // ...and boundaries/cum counts are non-decreasing in bucket order
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
    assert(rb.withColumn("pd", lag(col("boundary_date"), 1).over(w))
      .filter(col("pd").isNotNull && col("boundary_date") < col("pd")).isEmpty)
    rb.unpersist()
  }

  test("qc1: verdict mirrors the margin sign; margin stays inside the weight envelope") {
    val qc = TextAnalysis.qualityMargin(spark, sfDir).cache()
    assert(qc.filter(col("quality_pass") =!= (col("quality_margin") > 0.0)).isEmpty)
    // features are capped to [0,1], so the margin is boxed by the weights
    assert(qc.filter(col("quality_margin") > 3.1 || col("quality_margin") < -4.2).isEmpty)
    // the classifier must split this corpus, not rubber-stamp it
    val rates = qc.agg(avg(col("quality_pass").cast("double"))).collect()(0).getDouble(0)
    assert(rates > 0.0 && rates < 1.0, s"degenerate pass rate $rates")
    qc.unpersist()
  }

  test("bpe1: top pairs are 2-char, positive and rank-ordered") {
    val bp = TextAnalysis.bpePairCounts(spark, sfDir).cache()
    assert(bp.count() == 20)
    assert(bp.filter(char_length(col("pair")) =!= 2).isEmpty)
    val ns = bp.select(col("n")).collect().map(_.getLong(0))
    assert(ns.sameElements(ns.sorted(Ordering[Long].reverse)), "counts must be non-increasing")
    assert(ns.last > 0)
    bp.unpersist()
  }
}
