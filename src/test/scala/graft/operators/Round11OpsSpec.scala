package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants for the round-11 operator additions (seq1 event paths,
  * ev15 DAU/WAU, js1 source vocabulary overlap, txt14 sentence stats,
  * drift1 source KL, lp1 label propagation). Value-level correctness is
  * hash-checked against the DuckDB oracle by the driver gate; these pin
  * the structural properties the oracle compare can't express.
  */
class Round11OpsSpec extends SparkTestBase {

  test("seq1: path counts reconcile with the timeline triple count") {
    val paths = Relational.eventPaths(spark, sfDir, k = 1000).cache()
    val ev = graft.Engine.table(spark, sfDir, "events")
    // every user with n >= 3 events contributes exactly n-2 triples
    val expected = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
      .agg(sum(col("n") - 2)).collect()(0).getLong(0)
    val total = paths.agg(sum(col("n_paths"))).collect()(0).getLong(0)
    assert(total == expected, s"$total vs $expected")
    assert(paths.filter(col("n_paths") <= 0).isEmpty)
    paths.unpersist()
  }

  test("seq1: top-k is a prefix of the full ranking") {
    val top5 = Relational.eventPaths(spark, sfDir, k = 5).collect()
    val all = Relational.eventPaths(spark, sfDir, k = 1000).collect()
    assert(top5.toSeq == all.take(5).toSeq)
  }

  test("ev15: WAU bounds DAU and stickiness lands in (0, 1]") {
    val dw = Relational.dauWau(spark, sfDir).cache()
    assert(dw.filter(col("wau") < col("dau")).isEmpty, "7-day set contains the 1-day set")
    assert(dw.filter(col("stickiness") <= 0.0 || col("stickiness") > 1.0).isEmpty)
    // every observed day appears: the grid matches the distinct day count
    val days = graft.Engine.table(spark, sfDir, "events")
      .select((floor(unix_micros(col("ts")).cast("double") / 86400000000L)).cast("long"))
      .distinct().count()
    assert(dw.count() == days)
    dw.unpersist()
  }

  test("ev15: a day's WAU never exceeds the 7-day union of DAU sets") {
    val dw = Relational.dauWau(spark, sfDir).cache()
    // WAU(d) <= sum of DAU over the trailing window (union bound)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rangeBetween(-6, 0)
    val bound = dw.withColumn("dau_sum", sum(col("dau")).over(w))
    assert(bound.filter(col("wau") > col("dau_sum")).isEmpty)
    dw.unpersist()
  }

  test("js1: symmetric-pair inventory with intersection <= min vocab") {
    val ov = TextAnalysis.sourceOverlap(spark, sfDir).cache()
    val nSources = graft.Engine.table(spark, sfDir, "documents")
      .select(col("source")).distinct().count()
    assert(ov.count() == nSources * (nSources - 1) / 2)
    assert(ov.filter(col("source_a") >= col("source_b")).isEmpty)
    assert(ov.filter(col("n_common") > least(col("n_types_a"), col("n_types_b"))).isEmpty)
    assert(ov.filter(col("jaccard") < 0.0 || col("jaccard") > 1.0).isEmpty)
    ov.unpersist()
  }

  test("txt14: every document reports; zero-sentence docs report 0.0") {
    val st = TextAnalysis.sentenceStats(spark, sfDir).cache()
    assert(st.count() == graft.Engine.table(spark, sfDir, "documents").count())
    assert(st.filter(col("n_sentences") < 0).isEmpty)
    assert(st.filter(col("n_sentences") === 0 && col("avg_sent_chars") =!= 0.0).isEmpty)
    // sentence characters can't exceed the raw character budget
    val docs = graft.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).as("len"))
    assert(st.join(docs, "doc_id").filter(col("sent_chars") > col("len")).isEmpty)
    st.unpersist()
  }

  test("drift1: KL is non-negative and one row per source") {
    val kl = TextAnalysis.sourceDrift(spark, sfDir).cache()
    val nSources = graft.Engine.table(spark, sfDir, "documents")
      .select(col("source")).distinct().count()
    assert(kl.count() == nSources)
    // Gibbs: KL(p||q) >= 0; micros rounding can only move a term 5e-7
    assert(kl.filter(col("kl_divergence") < -1e-4).isEmpty)
    assert(kl.filter(col("n_vocab_tokens") < 0).isEmpty)
    kl.unpersist()
  }

  test("lp1: one verdict per subset vector, votes bounded by k") {
    val lp = Similarity.labelPropagation(spark, sfDir, k = 5, subset = 100).cache()
    assert(lp.count() == 100)
    assert(lp.filter(col("n_votes") < 1 || col("n_votes") > 5).isEmpty)
    // propagated labels come from the observed label domain
    val labels = graft.Engine.table(spark, sfDir, "embeddings")
      .select(col("label")).distinct().collect().map(_.getInt(0)).toSet
    val out = lp.select(col("new_label")).distinct().collect().map(_.getInt(0)).toSet
    assert(out.subsetOf(labels))
    lp.unpersist()
  }

  test("dd9: weights reconcile with dd1's cluster inventory") {
    val wts = Dedup.dupWeights(spark, sfDir).cache()
    assert(wts.count() == graft.Engine.table(spark, sfDir, "documents").count())
    // sum of weights = number of distinct content clusters (each cluster
    // contributes n * (1/n) = 1)
    val wsum = wts.agg(sum(col("weight"))).collect()(0).getDouble(0)
    val clusters = Dedup.exactDedup(spark, sfDir).count()
    assert(math.abs(wsum - clusters) < 1e-6, s"$wsum vs $clusters")
    assert(wts.filter(col("weight") <= 0.0 || col("weight") > 1.0).isEmpty)
    wts.unpersist()
  }

  test("dd10: containment bounds and the quote-inclusion asymmetry") {
    val cp = Dedup.containmentPairs(spark, sfDir, threshold = 0.1).cache()
    assert(cp.filter(col("cont_a") < 0.0 || col("cont_a") > 1.0).isEmpty)
    assert(cp.filter(col("cont_b") < 0.0 || col("cont_b") > 1.0).isEmpty)
    assert(cp.filter(col("doc_a") >= col("doc_b")).isEmpty)
    // containment >= Jaccard for the same pair (intersection over a
    // smaller denominator)
    assert(cp.filter(greatest(col("cont_a"), col("cont_b")) < lit(0.1)).isEmpty)
    cp.unpersist()
  }

  test("ev16: the grid is dow 0..6 x hour 0..23 and counts reconcile") {
    val ap = Relational.activityProfile(spark, sfDir).cache()
    assert(ap.filter(col("dow") < 0 || col("dow") > 6).isEmpty)
    assert(ap.filter(col("hour") < 0 || col("hour") > 23).isEmpty)
    val total = ap.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total == graft.Engine.table(spark, sfDir, "events").count())
    assert(ap.filter(col("n_users") > col("n_events")).isEmpty)
    ap.unpersist()
  }

  test("imb1: shares sum to one and surprisal peaks at 1/e") {
    val lb = Similarity.labelBalance(spark, sfDir).cache()
    val ssum = lb.agg(sum(col("share"))).collect()(0).getDouble(0)
    assert(math.abs(ssum - 1.0) < 1e-9)
    // -p ln p <= 1/e for p in (0,1]
    assert(lb.filter(col("surprisal") < 0.0 || col("surprisal") > 0.368).isEmpty)
    lb.unpersist()
  }

  test("tok2: fertility >= 1 whenever both counts are positive") {
    val f = TextAnalysis.bpeFertility(spark, sfDir).cache()
    assert(f.count() == graft.Engine.table(spark, sfDir, "documents").count())
    // the BPE pre-tokenizer splits within whitespace tokens, never
    // across them: pieces >= words on any doc with words
    assert(f.filter(col("n_words") > 0 && col("n_bpe_pieces") < col("n_words")).isEmpty)
    assert(f.filter(col("n_words") > 0 && col("fertility") < 1.0).isEmpty)
    f.unpersist()
  }

  test("sim7: drift cosine is a valid cosine and halves partition the corpus") {
    val cd = Similarity.centroidDrift(spark, sfDir).cache()
    assert(cd.filter(col("cos_drift") < -1.0 || col("cos_drift") > 1.0).isEmpty)
    val total = cd.agg(sum(col("n_early") + col("n_late"))).collect()(0).getLong(0)
    assert(total == graft.Engine.table(spark, sfDir, "embeddings").count())
    cd.unpersist()
  }

  test("hub1: in-degrees sum to at most subset*k and ranking is monotone") {
    val h = Similarity.knnHubness(spark, sfDir, k = 5, subset = 100, topK = 1000).cache()
    // every node emits exactly k out-edges; in-degrees across ALL nodes
    // sum to subset*k (top-1000 over 100 nodes captures all of them)
    val total = h.agg(sum(col("in_degree"))).collect()(0).getLong(0)
    assert(total == 100L * 5)
    assert(h.filter(col("in_degree") < 1).isEmpty)
    h.unpersist()
  }

  test("cl1: purity in (0,1], majority bounded by cluster size, members reconcile") {
    val cp = Similarity.clusterPurity(spark, sfDir).cache()
    assert(cp.filter(col("purity") <= 0.0 || col("purity") > 1.0).isEmpty)
    assert(cp.filter(col("n_majority") > col("n_members")).isEmpty)
    val total = cp.agg(sum(col("n_members"))).collect()(0).getLong(0)
    assert(total == graft.Engine.table(spark, sfDir, "embeddings").count())
    cp.unpersist()
  }

  test("txt15: counts are consistent with txt14 and the score is bounded above") {
    val r = TextAnalysis.readability(spark, sfDir).cache()
    val st = TextAnalysis.sentenceStats(spark, sfDir)
      .select(col("doc_id"), col("n_sentences").as("s14"))
    assert(r.join(st, "doc_id").filter(col("n_sentences") =!= col("s14")).isEmpty)
    // flesch <= 206.835 + a syllable-free allowance; scored docs only
    assert(r.filter(col("n_words") > 0 && col("n_sentences") > 0 &&
      col("flesch_score") > 206.835).isEmpty)
    r.unpersist()
  }

  test("shuf1: a permutation — every doc once, positions dense per shard") {
    val sh = TextAnalysis.globalShuffle(spark, sfDir, nShards = 4).cache()
    val nDocs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(sh.count() == nDocs)
    assert(sh.select(col("doc_id")).distinct().count() == nDocs)
    assert(sh.filter(col("shard") < 0 || col("shard") > 3).isEmpty)
    // positions are 1..n_shard with no gaps: max(pos) == count per shard
    val off = sh.groupBy(col("shard"))
      .agg(max(col("pos")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(off.isEmpty)
    // determinism: a second build yields the identical assignment
    val again = TextAnalysis.globalShuffle(spark, sfDir, nShards = 4)
    assert(sh.except(again).isEmpty && again.except(sh).isEmpty)
    sh.unpersist()
  }

  test("lm2: probabilities are valid micros and the mix interpolates them") {
    val lm = TextAnalysis.trigramLm(spark, sfDir).cache()
    assert(lm.filter(col("p3_micro") < 0 || col("p3_micro") > 1000000L).isEmpty)
    assert(lm.filter(col("mix_micro") < 0 || col("mix_micro") > 1000000L).isEmpty)
    // mix = 0.6*p3 + 0.4*p2 with p2 in [0,1]: mix >= 0.6*p3 - 1 (int floor)
    assert(lm.filter(col("mix_micro") * 10 < col("p3_micro") * 6 - 10).isEmpty)
    assert(lm.filter(col("succ_rank") < 1 || col("succ_rank") > 3).isEmpty)
    lm.unpersist()
  }

  test("gram2: shares are per-language fractions and ranks are dense") {
    val g = TextAnalysis.charTrigrams(spark, sfDir).cache()
    assert(g.filter(col("share_micro") <= 0 || col("share_micro") > 1000000L).isEmpty)
    assert(g.filter(length(col("trigram")) =!= 3).isEmpty)
    val ranks = g.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"))
      .filter(col("n") =!= col("mx"))
    assert(ranks.isEmpty, "rnk is 1..n per language with no gaps")
    g.unpersist()
  }

  test("ev18: pair inventory bounds and intersection <= min user set") {
    val af = Relational.typeAffinity(spark, sfDir).cache()
    val nTypes = graft.Engine.table(spark, sfDir, "events")
      .select(col("event_type")).distinct().count()
    assert(af.count() == nTypes * (nTypes - 1) / 2)
    assert(af.filter(col("n_both") > least(col("n_users_a"), col("n_users_b"))).isEmpty)
    assert(af.filter(col("jaccard") < 0.0 || col("jaccard") > 1.0).isEmpty)
    af.unpersist()
  }

  test("dq1: the generated data is clean and every check reports") {
    val audit = Relational.integrityAudit(spark, sfDir).cache()
    assert(audit.count() == 7)
    // TPC-H-ish generated data satisfies its own constraints
    assert(audit.filter(col("n_violations") =!= 0L).isEmpty,
      audit.filter(col("n_violations") =!= 0L).collect().mkString(","))
    audit.unpersist()
  }

  test("reg1: trend agrees with Spark's built-in least squares") {
    val tr = Relational.valueTrend(spark, sfDir).cache()
    assert(tr.filter(col("n") <= 0).isEmpty)
    // cross-check one type against regr_slope (float merge order differs
    // from the exact-moment form, hence tolerance, not equality)
    val hourUs = 3600000000L
    val ev = graft.Engine.table(spark, sfDir, "events")
      .select(col("event_type"),
        floor(unix_micros(col("ts")).cast("double") / hourUs).cast("long")
          .cast("double").as("x"),
        col("value"))
    val builtin = ev.filter(col("event_type") === "view")
      .agg(expr("regr_slope(value, x)")).collect()(0).getDouble(0)
    val exact = tr.filter(col("event_type") === "view")
      .collect()(0).getAs[Double]("slope_per_hour")
    assert(math.abs(builtin - exact) < 1e-4, s"$builtin vs $exact")
    tr.unpersist()
  }

  test("ev19: every purchase reports once; attributed views precede it") {
    val at = Relational.lastTouchAttribution(spark, sfDir).cache()
    val ev = graft.Engine.table(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase").count()
    assert(at.count() == purchases)
    // attributed gaps are non-negative; unattributed report -1 with null id
    assert(at.filter(col("attributed_view_id").isNotNull && col("gap_us") < 0).isEmpty)
    assert(at.filter(col("attributed_view_id").isNull && col("gap_us") =!= -1L).isEmpty)
    // the attributed event really is a view
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("attributed_view_id"))
    assert(at.filter(col("attributed_view_id").isNotNull)
      .join(views, Seq("attributed_view_id"), "left_anti").isEmpty)
    at.unpersist()
  }

  test("mix2: allocations never exceed availability or undershoot past the grant floor") {
    val al = TextAnalysis.tokenAllocation(spark, sfDir).cache()
    assert(al.filter(col("allocation") > col("avail")).isEmpty)
    assert(al.filter(col("allocation") < 0).isEmpty)
    assert(al.filter(col("fill_rate") < 0.0 || col("fill_rate") > 1.0).isEmpty)
    // total allocation stays within the budget (total div 2)
    val row = al.agg(sum(col("allocation")).as("a"), sum(col("avail")).as("t"))
      .collect()(0)
    assert(row.getLong(0) <= row.getLong(1) / 2)
    // and redistribution leaves at most |langs| tokens unallocated when
    // capacity remains (integer-floor slack only)
    val capLeft = al.filter(col("allocation") < col("avail")).count()
    if (capLeft > 0)
      assert(row.getLong(1) / 2 - row.getLong(0) <= al.count(), "floor slack only")
    al.unpersist()
  }

  test("lp1: unanimous neighborhoods keep their majority label stable") {
    // a vector whose 5 votes are unanimous must adopt exactly that label
    val lp = Similarity.labelPropagation(spark, sfDir, k = 5, subset = 100)
    val unanimous = lp.filter(col("n_votes") === 5)
    // (vacuously true if none are unanimous — the assertion is on shape)
    assert(unanimous.filter(col("new_label").isNull).isEmpty)
  }
}
