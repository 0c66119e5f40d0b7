package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Par.BoundedOrder

/** Probabilistic-structure operators beyond the KMV sketch (kmv1):
  * a HyperLogLog register sketch and a Bloom-filter join-pruning pass.
  *
  * Both follow the repo's portable-hash discipline (the dd3/dd4/kmv1
  * pattern): every pseudo-random bit comes from md5 over the value, so
  * a DuckDB oracle recomputes the IDENTICAL registers / bit positions
  * and the driver hash-checks the approximation itself, not just its
  * envelope. Reference anchor: the reference engine exposes
  * approx_count_distinct-style sketches through its embedded engine's
  * aggregate surface (swanlake-core/src/engine/mod.rs query path); the
  * Spark-native scale story is noted per operator.
  */
object Sketches {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Engine.table(s, dir, n)

  // === hll1: HyperLogLog register sketch ===================================
  val hllBuckets = 64 // m; 6 bits of the 32-bit md5-prefix hash
  val hllValueBits = 27 // 26-bit remainder => rho in [1, 27]
  /** alpha_64 * m^2 * 2^27 — the estimator numerator. Spelled as the
    * same left-associated product in the oracle so the folded double is
    * bit-identical.
    */
  private val hllNumerator = "0.709 * 4096 * 134217728.0"

  /** The linear-counting branch's m * ln(m / V) for every possible
    * zero-register count V in [1, m]: neither engine guarantees a
    * correctly-rounded ln(), but V has only 64 possible values, so the
    * correction becomes a literal lookup whose doubles are formatted
    * once (shortest round-trip repr) and parsed correctly-rounded by
    * BOTH engines — bit-identical by construction.
    */
  private val lcTable: IndexedSeq[(Int, Double)] =
    (1 to hllBuckets).map(v => v -> hllBuckets * math.log(hllBuckets.toDouble / v))

  /** HLL distinct-shingle estimate per source, next to the exact count —
    * the same 3-gram shingle domain as kmv1, so the two sketch families
    * are directly comparable on accuracy per byte of state.
    *
    * Register arithmetic stays in exact integers end-to-end: rho is the
    * leading-one position of the 26-bit hash remainder, each register
    * contributes 2^(27 - M_j) (a BIGINT), absent registers contribute
    * 2^27, and the register sum S (<= 64 * 2^27 = 2^33) converts to
    * double ONCE for the single estimator division — so the
    * float-summation order that makes the textbook harmonic mean
    * nondeterministic under parallel aggregation never appears, on
    * either engine. The small-range regime (raw estimate <= 2.5m with
    * empty registers) takes the standard linear-counting branch via
    * `lcTable` — see its doc for why that stays bit-portable.
    *
    * Shape at 100 TB: HLL registers are max-merge monoids, so the
    * groupBy(source, bucket) partial-aggregates map-side to <= 64 rows
    * per source per partition before any exchange; the per-source
    * rollup then moves 64 longs per source. The exact-count branch
    * (the verification baseline) is the only part that shuffles the
    * full distinct shingle set — a deployment drops it and keeps the
    * sketch.
    */
  def hllSketch(s: SparkSession, dir: String): DataFrame = {
    val n = 3
    val toksCol = TextAnalysis.tokens(col("text"))
    val toks = Par.fanOut(t(s, dir, "documents").select(col("source"), col("text")))
      .select(col("source"), toksCol.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("source"), explode(
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j)): _*))
      ).as("tok"))
      .distinct()
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast(LongType))
    val bucket = col("h").bitwiseAND(lit((hllBuckets - 1).toLong))
    val v = shiftright(col("h"), 6) // 26-bit remainder
    val rho = when(v > 0, lit(hllValueBits) - length(bin(v))).otherwise(lit(hllValueBits))
    val regs = toks
      .select(col("source"), col("tok"), bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("m"), count(lit(1)).as("n_toks"))
    val perSource = regs.groupBy(col("source")).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 27 - m)")).as("s_present"),
      count(lit(1)).as("n_registers"),
      sum(col("n_toks")).as("n_exact"))
    val sTotal = col("s_present") +
      (lit(hllBuckets.toLong) - col("n_registers")) * lit(1L << hllValueBits)
    val raw = expr(hllNumerator) / sTotal.cast(DoubleType)
    val vZero = lit(hllBuckets.toLong) - col("n_registers")
    val lc = lcTable.foldLeft(lit(Double.NaN)) { case (acc, (v, d)) =>
      when(vZero === v.toLong, lit(d)).otherwise(acc)
    }
    val est = when(vZero > 0 && raw <= lit(2.5 * hllBuckets), lc).otherwise(raw)
    perSource
      .select(col("source"), col("n_exact"),
        col("n_registers"),
        est.as("hll_estimate"),
        ((est - col("n_exact").cast(DoubleType)) / col("n_exact").cast(DoubleType))
          .as("rel_error"))
      .orderedSmall(col("source"))
  }

  def hllSketchSql: String = {
    val lcCase = lcTable.map { case (v, d) => s"WHEN ${64 - v} THEN $d" }.mkString(" ")
    s"""WITH raw_toks AS (
       |  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS t
       |  FROM documents),
       |toks AS (
       |  SELECT DISTINCT source, UNNEST(list_transform(generate_series(1, len(t) - 2),
       |    i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS tok
       |  FROM raw_toks WHERE len(t) >= 3),
       |h AS (
       |  SELECT source, tok, ('0x' || substring(md5(tok), 1, 8))::BIGINT AS h FROM toks),
       |rho AS (
       |  SELECT source, h % 64 AS bucket,
       |    CASE WHEN (h >> 6) > 0 THEN 27 - length(bin(h >> 6)) ELSE 27 END AS rho
       |  FROM h),
       |regs AS (
       |  SELECT source, bucket, MAX(rho) AS m, COUNT(*) AS n_toks
       |  FROM rho GROUP BY source, bucket),
       |per_source AS (
       |  SELECT source,
       |    CAST(SUM(CAST(1 AS BIGINT) << (27 - m)) AS BIGINT) AS s_present,
       |    COUNT(*) AS n_registers,
       |    CAST(SUM(n_toks) AS BIGINT) AS n_exact
       |  FROM regs GROUP BY source),
       |est AS (
       |  SELECT source, n_exact, n_registers,
       |    CASE WHEN (64 - n_registers) > 0
       |          AND ($hllNumerator) / CAST(s_present + (64 - n_registers) * 134217728 AS DOUBLE)
       |              <= ${2.5 * hllBuckets}
       |      THEN CASE n_registers $lcCase ELSE CAST('nan' AS DOUBLE) END
       |      ELSE ($hllNumerator) / CAST(s_present + (64 - n_registers) * 134217728 AS DOUBLE)
       |    END AS hll_estimate
       |  FROM per_source)
       |SELECT source, n_exact, n_registers, hll_estimate,
       |  (hll_estimate - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE) AS rel_error
       |FROM est ORDER BY source""".stripMargin
  }

  // === bf1: Bloom-filter join pruning ======================================
  val bloomBits = 16384 // m
  val bloomHashes = 3 // k

  /** Bloom-filter semi-join pruning, measured: build a 16384-bit filter
    * over the high-balance customer keys (c_acctbal > 9000), probe every
    * distinct ordering customer, and report the exact candidate /
    * true-match / false-positive ledger plus the realized FP rate.
    *
    * This is the runtime-filter pattern (Spark's own
    * spark.sql.optimizer.runtime.bloomFilter does the same dance
    * opaquely): the filter's set-bit table is WHAT gets broadcast, the
    * big side is pruned before its expensive join/shuffle. Here the
    * probe side keeps only rows whose k positions are ALL set.
    *
    * Determinism: positions are md5-derived, the filter is a distinct
    * position SET (not a packed bitmap), membership is an exact
    * count-match against the probe key's own distinct position count —
    * the double-hash-collision case (two of a key's k positions equal)
    * is counted once on both sides, so no false negatives by
    * construction and the FP count is engine-identical.
    *
    * Shape at 100 TB: the build side aggregates to <= m distinct
    * positions (a few KB — broadcast); the probe side is map-only
    * explode(k) + broadcast-semi-join + per-key count, one combinable
    * shuffle on the probe key. The final ledger is a single-row
    * aggregate.
    */
  def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    def positions(key: org.apache.spark.sql.Column) =
      (0 until bloomHashes).map { i =>
        conv(substring(md5(concat_ws("#", lit("bf"), lit(i), key)), 1, 8), 16, 10)
          .cast(LongType) % bloomBits
      }
    val keys = t(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"))
    val bits = keys
      .select(explode(array(positions(col("c_custkey")): _*)).as("pos"))
      .distinct()
    val probes = t(s, dir, "orders").select(col("o_custkey")).distinct()
      .select(col("o_custkey"), explode(array(positions(col("o_custkey")): _*)).as("pos"))
      .distinct()
    val probed = probes
      .join(broadcast(bits.withColumn("set_bit", lit(1))), Seq("pos"), "left")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_pos"), count(col("set_bit")).as("n_hit"))
      .withColumn("candidate", (col("n_pos") === col("n_hit")).cast(IntegerType))
    val truth = keys.select(col("c_custkey").as("o_custkey")).withColumn("is_member", lit(1))
    val ledger = probed.join(broadcast(truth), Seq("o_custkey"), "left")
      .agg(
        count(lit(1)).as("n_probed"),
        sum(col("candidate")).cast(LongType).as("n_candidates"),
        sum(coalesce(col("is_member"), lit(0))).cast(LongType).as("n_true"),
        sum(when(col("candidate") === 1 && col("is_member").isNull, 1L).otherwise(0L))
          .cast(LongType).as("n_false_pos"))
    val nKeys = keys.agg(count(lit(1)).as("n_keys"))
    val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
    ledger.crossJoin(nKeys).crossJoin(nBits)
      .select(col("n_keys"), col("n_bits_set"), col("n_probed"), col("n_candidates"),
        col("n_true"), col("n_false_pos"),
        (col("n_false_pos").cast(DoubleType) /
          (col("n_probed") - col("n_true")).cast(DoubleType)).as("fp_rate"))
  }

  def bloomPruneSql: String = {
    def pos(i: Int, key: String) =
      s"('0x' || substring(md5(concat_ws('#', 'bf', '$i', CAST($key AS VARCHAR))), 1, 8))::BIGINT % $bloomBits"
    val keyPos = (0 until bloomHashes).map(i => pos(i, "c_custkey")).mkString(", ")
    val probePos = (0 until bloomHashes).map(i => pos(i, "o_custkey")).mkString(", ")
    s"""WITH keys AS (
       |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
       |bits AS (
       |  SELECT DISTINCT UNNEST([$keyPos]) AS pos FROM keys),
       |probe_pos AS (
       |  SELECT DISTINCT o_custkey, UNNEST([$probePos]) AS pos
       |  FROM (SELECT DISTINCT o_custkey FROM orders)),
       |probed AS (
       |  SELECT p.o_custkey, COUNT(*) AS n_pos, COUNT(b.pos) AS n_hit
       |  FROM probe_pos p LEFT JOIN bits b ON p.pos = b.pos
       |  GROUP BY p.o_custkey),
       |ledger AS (
       |  SELECT
       |    COUNT(*) AS n_probed,
       |    CAST(SUM(CASE WHEN n_pos = n_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
       |    CAST(SUM(CASE WHEN k.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |    CAST(SUM(CASE WHEN n_pos = n_hit AND k.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_false_pos
       |  FROM probed LEFT JOIN keys k ON probed.o_custkey = k.c_custkey)
       |SELECT
       |  (SELECT COUNT(*) FROM keys) AS n_keys,
       |  (SELECT COUNT(*) FROM bits) AS n_bits_set,
       |  n_probed, n_candidates, n_true, n_false_pos,
       |  CAST(n_false_pos AS DOUBLE) / CAST(n_probed - n_true AS DOUBLE) AS fp_rate
       |FROM ledger""".stripMargin
  }

  // === cms1: Count-Min heavy hitters =======================================
  val cmsRows = 4 // d
  val cmsWidth = 256 // w
  val cmsTopN = 20

  /** Count-Min frequency sketch, audited on the heavy hitters: build
    * the d x w register table over token occurrences, read back the
    * top-20 exact tokens through the sketch (estimate = min over the d
    * registers), and report the guaranteed-nonnegative overcount. With
    * kmv1 (distinct), hll1 (distinct registers) and bf1 (membership)
    * this completes the classical sketch quartet, every one of them
    * hash-checked end-to-end because the hash family is md5.
    *
    * All arithmetic is integer counts — nothing to round, no IEEE
    * anywhere but the final (exact) ratio-free columns.
    *
    * Shape at 100 TB: the register build is a vocabulary-bounded
    * aggregate (token counts first — map-side combinable — then d
    * positions per DISTINCT token, never per occurrence); the register
    * table is d*w = 1024 rows (broadcast); the heavy-hitter readback
    * is TakeOrdered + a broadcast join. Two passes over the count
    * table, zero passes over raw text beyond the first tokenize.
    */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    def pos(i: Int, tok: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws("#", lit("cms"), lit(i), tok)), 1, 8), 16, 10)
        .cast(LongType) % cmsWidth
    val counts = Par.fanOut(t(s, dir, "documents").select(col("text")))
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val regs = counts
      .select(col("n_exact"), posexplode(
        array((0 until cmsRows).map(i => pos(i, col("tok"))): _*)).as(Seq("i", "pos")))
      .groupBy(col("i"), col("pos"))
      .agg(sum(col("n_exact")).as("reg"))
    val top = counts.orderBy(col("n_exact").desc, col("tok")).limit(cmsTopN)
    top
      .select(col("tok"), col("n_exact"), posexplode(
        array((0 until cmsRows).map(i => pos(i, col("tok"))): _*)).as(Seq("i", "pos")))
      .join(broadcast(regs), Seq("i", "pos"))
      .groupBy(col("tok"))
      .agg(max(col("n_exact")).as("n_exact"), min(col("reg")).as("cms_estimate"))
      .select(col("tok"), col("n_exact"), col("cms_estimate"),
        (col("cms_estimate") - col("n_exact")).as("overcount"))
      .orderBy(col("n_exact").desc, col("tok"))
  }

  def cmsHeavyHittersSql: String = {
    def pos(i: Int, tok: String) =
      s"(('0x' || substring(md5(concat_ws('#', 'cms', '$i', $tok)), 1, 8))::BIGINT % $cmsWidth)"
    val keyPos = (0 until cmsRows)
      .map(i => s"{'i': $i, 'pos': ${pos(i, "tok")}}").mkString(", ")
    s"""WITH counts AS (
       |  SELECT UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents),
       |exact AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM counts GROUP BY tok),
       |keyed AS (
       |  SELECT tok, n_exact, UNNEST([$keyPos]) AS ip FROM exact),
       |regs AS (
       |  SELECT ip.i AS i, ip.pos AS pos, CAST(SUM(n_exact) AS BIGINT) AS reg
       |  FROM keyed GROUP BY 1, 2),
       |top AS (
       |  SELECT tok, n_exact FROM exact ORDER BY n_exact DESC, tok LIMIT $cmsTopN),
       |est AS (
       |  SELECT k.tok, MAX(k.n_exact) AS n_exact, MIN(r.reg) AS cms_estimate
       |  FROM (SELECT tok, n_exact, UNNEST([$keyPos]) AS ip FROM top) k
       |  JOIN regs r ON r.i = k.ip.i AND r.pos = k.ip.pos
       |  GROUP BY k.tok)
       |SELECT tok, n_exact, cms_estimate, cms_estimate - n_exact AS overcount
       |FROM est ORDER BY n_exact DESC, tok""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hll1_hll_sketch" -> hllSketch _,
    "bf1_bloom_prune" -> bloomPrune _,
    "cms1_heavy_hitters" -> cmsHeavyHitters _)

  val oracles: Map[String, String] = Map(
    "hll1_hll_sketch" -> hllSketchSql,
    "bf1_bloom_prune" -> bloomPruneSql,
    "cms1_heavy_hitters" -> cmsHeavyHittersSql)
}
