package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand fixtures for the round-18 operators: ts9 (Mann–Kendall trend
  * test), corr3 (Spearman rank correlation of the daily series), dd16
  * (winnowing fingerprint pairs), fs1 (χ² token–source association).
  * Each pins exact values computed by hand or by an INDEPENDENT
  * implementation inside the spec (MessageDigest md5, textbook
  * formulas) — the DuckDB oracle is the third anchor, checked by the
  * driver gate.
  */
class Round18OpsSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def tsOfDay(d: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(d.toLong * 86400))

  private def rnd9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  // === ts9 ================================================================

  private def runMk(dailyVals: Seq[Seq[Double]]): org.apache.spark.sql.Row = {
    import spark.implicits._
    val dir = tmp("ts9")
    dailyVals.zipWithIndex
      .flatMap { case (vs, d) => vs.map(v => (tsOfDay(d), v)) }
      .toDF("ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = Analytics.mannKendall(spark, dir).collect()
    assert(rows.length == 1)
    rows.head
  }

  test("ts9: rising series — S = C(n,2), no ties, continuity-corrected z") {
    // day sums 1.0, 2.0, 3.0 (day 0 aggregates two events: 0.25 + 0.75)
    val r = runMk(Seq(Seq(0.25, 0.75), Seq(2.0), Seq(3.0)))
    assert(r.getLong(0) == 3L) // n_days
    assert(r.getLong(1) == 3L) // S: every pair rises
    assert(r.getLong(2) == 66L) // 18*Var = n(n-1)(2n+5) = 3*2*11
    assert(r.getDouble(3) == rnd9(2.0 / math.sqrt(66.0 / 18.0)), s"z ${r.getDouble(3)}")
  }

  test("ts9: falling series mirrors the sign and the +1 continuity branch") {
    val r = runMk(Seq(Seq(3.0), Seq(2.0), Seq(1.0)))
    assert(r.getLong(1) == -3L)
    assert(r.getLong(2) == 66L)
    assert(r.getDouble(3) == rnd9(-2.0 / math.sqrt(66.0 / 18.0)))
  }

  test("ts9: tied values shrink Var(S) by t(t-1)(2t+5)") {
    // day sums 1, 1, 2: S = 0 + 1 + 1 = 2; one tie group of 2 -> 18
    val r = runMk(Seq(Seq(1.0), Seq(1.0), Seq(2.0)))
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 48L, "66 - 2*1*9")
    assert(r.getDouble(3) == rnd9(1.0 / math.sqrt(48.0 / 18.0)))
  }

  test("ts9: constant series has zero variance and NULL z") {
    val r = runMk(Seq(Seq(5.0), Seq(5.0), Seq(5.0)))
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 0L)
    assert(r.isNullAt(3), "all-tied series must report NULL z, not NaN/Inf")
  }

  test("ts9: agrees in sign with ts8's Theil-Sen slope on the shared frame") {
    val mk = Analytics.mannKendall(spark, sfDir).collect().head
    val ts = Analytics.theilSenTrend(spark, sfDir).collect().head
    val slope = ts.getDouble(2)
    val s = mk.getLong(1)
    assert(mk.getLong(0) == ts.getLong(0), "both tests run on the identical daily frame")
    // S > 0 <=> more rising than falling pairs; the median pairwise
    // slope then cannot be negative (and vice versa)
    if (s > 0) assert(slope >= 0.0, s"S=$s but Theil-Sen slope $slope")
    if (s < 0) assert(slope <= 0.0, s"S=$s but Theil-Sen slope $slope")
  }

  // === corr3 ==============================================================

  private def runSpearman(ev: Seq[Double], or: Seq[Double]): org.apache.spark.sql.Row = {
    import spark.implicits._
    val dir = tmp("corr3")
    ev.zipWithIndex.map { case (v, d) => (tsOfDay(d), v) }
      .toDF("ts", "value").coalesce(1).write.parquet(s"$dir/events.parquet")
    or.zipWithIndex.map { case (v, d) => (tsOfDay(d), v) }
      .toDF("o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val rows = Analytics.spearmanDaily(spark, dir).collect()
    assert(rows.length == 1)
    rows.head
  }

  test("corr3: permutation ranks give the textbook 1 - 6*sum(d^2)/(n(n^2-1))") {
    // x ranks [1,2,3], y ranks [3,1,2]: d^2 = 4+1+1 -> rho = 1 - 36/24 = -0.5
    val r = runSpearman(Seq(1.0, 2.0, 3.0), Seq(30.0, 10.0, 20.0))
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == -0.5, s"rho ${r.getDouble(1)}")
  }

  test("corr3: perfect monotone agreement is exactly 1") {
    val r = runSpearman(Seq(1.0, 2.0, 3.0, 4.0), Seq(10.0, 11.0, 12.0, 13.0))
    assert(r.getDouble(1) == 1.0)
  }

  test("corr3: ties use average ranks (doubled-rank trick)") {
    // x [1,2,3] -> r2 [2,4,6]; y [10,10,20] -> avg ranks [1.5,1.5,3] -> r2 [2,2,6]
    // Pearson over avg ranks: 1.5 / (sqrt(2)*sqrt(1.5)) = 0.8660254...
    val r = runSpearman(Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0, 20.0))
    val n = 3.0; val sx = 12.0; val sy = 10.0; val sxy = 48.0; val sxx = 56.0; val syy = 44.0
    val want = rnd9((n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    assert(r.getDouble(1) == want, s"rho ${r.getDouble(1)} want $want")
    assert(math.abs(r.getDouble(1) - 0.866025404) < 1e-9)
  }

  test("corr3: a constant side is degenerate -> NULL") {
    val r = runSpearman(Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0, 10.0))
    assert(r.isNullAt(1))
  }

  // === dd16 ===============================================================

  /** Independent winnowing implementation: JDK MessageDigest md5 over the
    * same 3-token shingles, min of every w-window, distinct set.
    */
  private def winnowRef(text: String, w: Int = 4): Set[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.length < 3) return Set.empty
    val hs = toks.sliding(3).map(g => md5hex(g.mkString(" "))).toVector
    if (hs.length < w) return Set.empty
    (0 to hs.length - w).map(i => hs.slice(i, i + w).min).toSet
  }

  test("dd16: fingerprints and pair scores match the independent implementation") {
    import spark.implicits._
    val dir = tmp("dd16")
    val a = "the quick brown fox jumps over the lazy dog tonight again"
    val b = "the quick brown fox jumps over the lazy dog tomorrow morning maybe"
    val c = "entirely different content with no shared trigrams at all here"
    Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val fps = Map(1L -> winnowRef(a), 2L -> winnowRef(b), 3L -> winnowRef(c))
    val expected = (for {
      (da, db) <- Seq((1L, 2L), (1L, 3L), (2L, 3L))
      shared = (fps(da) intersect fps(db)).size if shared >= 2
    } yield (da, db) -> (shared.toLong, fps(da).size.toLong, fps(db).size.toLong,
      shared.toDouble / math.min(fps(da).size, fps(db).size))).toMap
    assert(expected.nonEmpty, "fixture must produce at least one >= 2-shared pair")
    val got = Dedup.winnowPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got == expected, s"got $got want $expected")
  }

  test("dd16: the winnowing guarantee — a shared >= w+k-1 token run yields a shared fingerprint") {
    // 7 shared tokens >= 6 = w+k-1: at least one window lies wholly
    // inside the shared hash run on both sides, and equal windows of
    // equal hashes select equal minima
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val x = s"$shared one two three"
    val y = s"zero $shared nine ten"
    assert((winnowRef(x) intersect winnowRef(y)).nonEmpty)
  }

  test("ts9: randomized brute-force equivalence (S, Var, z) under a fixed seed") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 6).foreach { _ =>
      val days = 3 + rnd.nextInt(8)
      val vals = Seq.fill(days)((1 + rnd.nextInt(4)).toDouble) // small range forces ties
      val r = runMk(vals.map(Seq(_)))
      // brute force over the day-ordered series
      val s = (for (i <- vals.indices; j <- i + 1 until vals.length)
        yield math.signum(vals(j) - vals(i)).toLong).sum
      val n = days.toLong
      val ties = vals.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val varX18 = n * (n - 1) * (2 * n + 5) - ties
      assert(r.getLong(0) == n && r.getLong(1) == s && r.getLong(2) == varX18,
        s"series $vals: got (${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}) want ($n,$s,$varX18)")
      if (varX18 == 0) assert(r.isNullAt(3))
      else {
        val zRef = rnd9((if (s > 0) s - 1.0 else if (s < 0) s + 1.0 else 0.0) /
          math.sqrt(varX18.toDouble / 18.0))
        assert(r.getDouble(3) == zRef, s"series $vals: z ${r.getDouble(3)} want $zRef")
      }
    }
  }

  test("dd16: randomized winnowing guarantee and sampling-density bounds") {
    val rnd = new scala.util.Random(20260816L)
    val vocab = ('a' to 'z').map(_.toString)
    def randToks(n: Int): Seq[String] = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    (1 to 30).foreach { _ =>
      val shared = randToks(6 + rnd.nextInt(6)) // >= w+k-1 = 6 shared tokens
      val x = (randToks(rnd.nextInt(8)) ++ shared ++ randToks(rnd.nextInt(8))).mkString(" ")
      val y = (randToks(rnd.nextInt(8)) ++ shared ++ randToks(rnd.nextInt(8))).mkString(" ")
      assert((winnowRef(x) intersect winnowRef(y)).nonEmpty,
        s"guarantee violated for shared run '${shared.mkString(" ")}'")
      // density: a selected min serves at most w consecutive windows, so
      // |fp| >= ceil(nWindows / w); and never more than one per window
      val toks = x.trim.split("\\s+").length
      val nWin = toks - 2 - 4 + 1 // hashes = toks-2, windows = hashes-w+1
      if (nWin > 0) {
        val fp = winnowRef(x).size
        assert(fp >= (nWin + 3) / 4 && fp <= nWin, s"density out of bounds: $fp of $nWin")
      }
    }
  }

  test("dd16: no fingerprints for documents shorter than w+k-1 tokens") {
    assert(winnowRef("a b c d e").isEmpty) // 5 tokens -> 3 hashes < w
    import spark.implicits._
    val dir = tmp("dd16s")
    Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    assert(Dedup.winnowPairs(spark, dir).collect().isEmpty)
  }

  // === dd17 ===============================================================

  test("dd17: whitespace twins cluster through the exact tier; singletons stay out") {
    import spark.implicits._
    val dir = tmp("dd17")
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, s"$body one"), (2L, s"$body   one"), // exact dup modulo whitespace
      (5L, "entirely unrelated content nothing shared whatsoever here today"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Dedup.multiTierClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.get(1L).contains((1L, 2L)))
    assert(rows.get(2L).contains((1L, 2L)))
    assert(!rows.contains(5L), "edge-free documents carry no cluster row")
  }

  test("dd17: equals an independent union-find over the three registered tiers") {
    // the tiers themselves are independently anchored (dd1/dd3/dd4
    // oracles); this pins the COMPOSITE: union of edges -> components
    // -> sizes, against a from-scratch union-find in the spec
    val exact = Dedup.exactDedup(spark, sfDir).collect()
    val exactEdges = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("h")).collect()
      .map(r => (r.getString(1), r.getLong(0))).toSeq.groupBy(_._1)
      .toSeq.flatMap { case (_, g) =>
        val ids = g.map(_._2).sorted; ids.tail.map(b => (ids.head, b))
      }
    val lsh = Dedup.minhashLsh(spark, sfDir).collect()
      .filter(_.getLong(2) >= 2).map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sh = Dedup.simhashPairs(spark, sfDir).collect()
      .filter(_.getInt(2) <= 8).map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = (exactEdges ++ lsh ++ sh).distinct
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x; while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val want = nodes.map(n => n -> find(n)).toMap
    val sizes = want.values.groupBy(identity).map { case (c, g) => c -> g.size.toLong }
    val got = Dedup.multiTierClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (d, (canon, size)) =>
      assert(canon == want(d), s"doc $d: canonical $canon want ${want(d)}")
      assert(size == sizes(want(d)), s"doc $d: size $size want ${sizes(want(d))}")
    }
    assert(exact.nonEmpty) // the exact tier genuinely participates
  }

  // === tri2 ===============================================================

  test("tri2: hand-built path and triangle graphs pin degree, triangles, coefficient") {
    import spark.implicits._
    val dir = tmp("tri2")
    def ray(deg: Double): (Float, Float) =
      (math.cos(math.toRadians(deg)).toFloat, math.sin(math.toRadians(deg)).toFloat)
    // path cluster in dims (1,2): angles 0,20,40,60,80 -> top-2 by cosine
    // is i±1 (cos 20° = .94 beats cos 40° = .77); mutual edges = the path
    val path = Seq(0, 20, 40, 60, 80).map(d => ray(d.toDouble))
    // triangle cluster in dims (3,4), orthogonal to the path cluster
    val tri = Seq(0, 1, 2).map(d => ray(d.toDouble))
    val vecs =
      path.zipWithIndex.map { case ((x, y), i) => (i.toLong, Array(x, y, 0f, 0f)) } ++
        tri.zipWithIndex.map { case ((u, v), i) => (i + 5L, Array(0f, 0f, u, v)) }
    vecs.toDF("vec_id", "embedding").coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.clusteringCoefficient(spark, dir, k = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.keySet == (0L to 4L).toSet ++ (5L to 7L).toSet)
    // path: ends deg 1 (NULL cc), middles deg 2 with no triangles
    assert(got(0L) == ((1L, 0L, None)))
    assert(got(4L) == ((1L, 0L, None)))
    Seq(1L, 2L, 3L).foreach(i => assert(got(i) == ((2L, 0L, Some(0.0))), s"node $i"))
    // triangle: K3 — every node closes its single wedge
    Seq(5L, 6L, 7L).foreach(i => assert(got(i) == ((2L, 1L, Some(1.0))), s"node $i"))
  }

  test("tri2: agrees with tri1's triangle counts and stays within [0, 1]") {
    val t1 = Similarity.knnTriangles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Similarity.clusteringCoefficient(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == t1.getOrElse(r.getLong(0), 0L),
        s"node ${r.getLong(0)}: triangles disagree with tri1")
      if (!r.isNullAt(3))
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // tri1 lists only nodes IN triangles; tri2 must cover every node with
    // an edge, a strict superset on any graph with an open wedge
    assert(rows.length >= t1.size)
  }

  // === exp5 ===============================================================

  test("exp5: matches an independent Welch computation over an independent md5 coin") {
    // recompute from raw events with JDK MessageDigest (independent of
    // Spark's md5/conv) and plain-double Welch formulas
    val md = java.security.MessageDigest.getInstance("MD5")
    def coin(id: Long): Double = {
      val hex = md.digest(s"exp1#$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val perUser = graft.Engine.table(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        Exact.micros(col("value"))).otherwise(0L)).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val (a, b) = perUser.partition { case (id, _) => coin(id) < 0.5 }
    def stats(xs: Array[Double]) = {
      val n = xs.length.toDouble; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(a.map(_._2 / 1e6))
    val (nb, mb, vb) = stats(b.map(_._2 / 1e6))
    val se2 = va / na + vb / nb
    val tRef = (ma - mb) / math.sqrt(se2)
    val dfRef = se2 * se2 / ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))
    val r = Analytics.welchTTest(spark, sfDir).collect().head
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length,
      "arm sizes must match the independent coin")
    assert(math.abs(r.getDouble(2) - ma) < 1e-5)
    assert(math.abs(r.getDouble(3) - mb) < 1e-5)
    assert(math.abs(r.getDouble(4) - tRef) < 1e-4, s"t ${r.getDouble(4)} ref $tRef")
    assert(math.abs(r.getDouble(5) - dfRef) < 1e-1, s"df ${r.getDouble(5)} ref $dfRef")
    // Welch df is bounded by min(nA,nB)-1 below and nA+nB-2 above
    assert(r.getDouble(5) >= math.min(na, nb) - 1 && r.getDouble(5) <= na + nb - 2)
  }

  // === dd18 ===============================================================

  test("dd18: exact duplicates calibrate to bucket 10 with zero error") {
    import spark.implicits._
    val dir = tmp("dd18")
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    Seq((1L, body), (2L, body),
      (9L, "wholly unrelated text with nothing in common at all anywhere today"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Dedup.sketchCalibration(spark, dir).collect()
    assert(rows.length == 1, rows.mkString(","))
    val r = rows.head
    assert(r.getLong(0) == 10L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 0.0)
  }

  test("dd18: covers every dd3 candidate pair, errors inside the binomial envelope") {
    val nPairs = Dedup.minhashLsh(spark, sfDir).count()
    val rows = Dedup.sketchCalibration(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == nPairs, "one calibration row per candidate pair")
    rows.foreach { r =>
      val bucket = r.getLong(0); val j = r.getDouble(3)
      assert(bucket == math.floor(j * 10).toLong || r.getLong(1) > 1,
        s"bucket $bucket vs mean exact $j") // single-pair buckets must agree exactly
      // E|err| for a k=32 binomial estimator is sqrt(J(1-J)/32) <= 0.089;
      // allow 3x the envelope for small-bucket noise
      assert(r.getDouble(4) <= 3 * math.sqrt(0.25 / 32) + 1e-9,
        s"bucket $bucket mean_abs_err ${r.getDouble(4)} outside the envelope")
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) <= 0.15,
        s"bucket $bucket estimate drifted from exact")
    }
  }

  // === review-pass NULL-parity legs =======================================

  test("stat1: a single-observation group reports NULL sample variance") {
    import spark.implicits._
    val dir = tmp("stat1n")
    Seq(("A", 0.04), ("B", 0.05), ("B", 0.07), ("B", 0.06))
      .toDF("l_returnflag", "l_discount")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val rows = Advanced.exactVariance(spark, dir).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows("A").isEmpty, "n=1: sample variance undefined -> NULL (DuckDB x/0 parity)")
    // B: var = (3*(25+49+36) - 18^2)/1e4 / (3*2) = (330-324)/1e4/6 = 1e-4
    assert(math.abs(rows("B").get - 1e-4) < 1e-12, rows("B").toString)
  }

  test("ev3: a props value without the pattern yields NULL, not a cast abort") {
    import spark.implicits._
    val dir = tmp("ev3n")
    Seq((1L, tsOfDay(0), """{"k": 7}"""), (2L, tsOfDay(0), "not json"),
      (3L, tsOfDay(0), """{"k":9}""")) // no space: pattern miss -> NULL
      .toDF("event_id", "ts", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = Relational.eventsJson(spark, dir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows == Map(1L -> Some(7L), 2L -> None, 3L -> None))
  }

  // === fs1 ================================================================

  test("fs1: hand-computed chi-squared on a 2-source corpus") {
    import spark.implicits._
    val dir = tmp("fs1")
    Seq((1L, "x x y", "s1"), (2L, "y y", "s2"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // N=5, sources s1:3 s2:2; x: Nr=2 all in s1; y: Nr=3 split 1/2
    // chi2_x = 5*(4/(2*3)) - 2 = 4/3; chi2_y = 5*(1/9 + 4/6) - 3 = 8/9
    // classic form, y: E=(1.8,1.2) -> 0.64/1.8 + 0.64/1.2 = 8/9 (cross-check)
    val rows = TextAnalysis.chi2Tokens(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(rows.keySet == Set("x", "y"))
    assert(rows("x") == ((2L, 1L, 1333333L, 1.333333)), rows("x").toString)
    assert(rows("y") == ((3L, 1L, 888888L, 0.888888)), rows("y").toString)
  }

  test("fs1: a token distributed exactly at the source shares scores zero") {
    import spark.implicits._
    val dir = tmp("fs1u")
    Seq((1L, "x y", "s1"), (2L, "x y", "s2"))
      .toDF("doc_id", "text", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.chi2Tokens(spark, dir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(3) == 0L, s"${r.getString(0)}: uniform split must score 0")
      assert(r.getDouble(4) == 0.0)
    }
  }

  test("fs1: chi2 tracks the classic per-cell formula on the real corpus") {
    // recompute chi2 for every reported token from its contingency row
    // with plain doubles — the exact-integer pipeline must agree to the
    // documented error bound (< N*|sources|/1e12, far under 1e-3 here)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val cells = docs.groupBy(col("token"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nr = cells.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    val nc = cells.groupBy(_._1._2).map { case (s, m) => s -> m.values.sum }
    val n = nc.values.sum.toDouble
    val got = TextAnalysis.chi2Tokens(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val ref = nc.keys.map { s =>
        val o = cells.getOrElse((t, s), 0L).toDouble
        val e = nr(t) * nc(s) / n
        (o - e) * (o - e) / e
      }.sum
      assert(math.abs(r.getDouble(4) - ref) < 1e-3, s"$t: got ${r.getDouble(4)} ref $ref")
      assert(r.getLong(1) == nr(t), s"$t n_token")
      assert(r.getLong(2) == nc.size - 1L, s"$t df")
    }
  }
}
