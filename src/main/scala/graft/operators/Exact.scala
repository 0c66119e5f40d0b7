package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact, engine-portable numeric aggregation.
  *
  * The driver's correctness gate compares Spark parquet output against a
  * DuckDB oracle VALUE-BY-VALUE through pandas, where dtype and textual
  * representation both matter: a Spark DECIMAL(38,6) arrives as
  * `decimal.Decimal('3793296.504000')` (trailing zeros) while DuckDB's
  * DECIMAL comes back float64 `3793296.504`, and DuckDB widens
  * SUM(BIGINT) to HUGEINT -> float64 while Spark keeps int64. Values can
  * be equal and still hash-red.
  *
  * The portable contract used by every query here:
  *   - integer outputs are BIGINT on BOTH engines (oracles wrap integer
  *     SUMs in CAST(... AS BIGINT));
  *   - fractional outputs are IEEE doubles produced by the IDENTICAL
  *     operation sequence on both engines from exactly-representable
  *     inputs, so the result is bit-identical and any downstream hash,
  *     string rendering, or comparison agrees.
  *
  * The fractional scheme: per-row round to integer micros (half away
  * from zero — the same rounding CAST(x AS DECIMAL(18,6)) performs),
  * sum exactly as DECIMAL(38,0) (long-backed, codegen-fast, ~25x the
  * per-row double->BigDecimal cast path, overflow-safe at 100 TB),
  * then ONE correctly-rounded conversion to double and ONE division by
  * 1e6. DuckDB mirrors: CAST(SUM(CAST(<micros> AS HUGEINT)) AS DOUBLE)
  * / 1000000.0. Exact integer -> double conversion is correctly rounded
  * in both engines and the division is a single IEEE op, so the bits
  * match; because the bits match, ORDER BY / HAVING / equality on these
  * values also agree across engines.
  *
  * floor(x+0.5)/ceil(x-0.5) is the codegen-fast half-away rounding (the
  * builtin round() routes every value through BigDecimal — measured
  * ~2.5x slower on a full-table aggregate).
  */
object Exact {

  val D380: DecimalType = DecimalType(38, 0)

  /** Integer micros of a double column, half-away-from-zero. */
  def micros(c: Column): Column =
    when(c >= 0, floor(c * 1000000L + 0.5)).otherwise(ceil(c * 1000000L - 0.5)).cast(LongType)

  /** JVM scalar twin of [[micros]] — the SAME half-away rounding for
    * driver-side exact arithmetic (PQ codebook means, collected-frame
    * computations). A locally restated copy could silently desync from
    * the column form and break a Spark-vs-oracle parity contract.
    */
  def microsOf(x: Double): Long =
    (if (x >= 0) math.floor(x * 1000000L + 0.5) else math.ceil(x * 1000000L - 0.5)).toLong

  /** Deterministic scale-`s` rounding emitted as a double: the SAME
    * floor/ceil fixed-point formula on both engines (library round()
    * differs — Spark routes through BigDecimal HALF_UP while DuckDB
    * computes std::round(x*p)/p, which can diverge by an ulp near
    * half-way boundaries). Valid while |x|*10^s < 2^53.
    */
  def dround(c: Column, s: Int): Column = {
    val p = math.pow(10, s)
    (when(c >= 0, floor(c * p + 0.5)).otherwise(ceil(c * p - 0.5)).cast(LongType)
      .cast(DoubleType) / lit(p))
  }

  /** JVM scalar twin of [[dround]] (the microsOf pattern): the SAME
    * floor/ceil fixed-point formula for driver-side tiers that must
    * replicate the column arithmetic bit-for-bit (sim11's greedy
    * cascade). A locally restated copy could silently desync from the
    * column form and break a Spark-vs-oracle parity contract.
    */
  def droundOf(x: Double, s: Int): Double = {
    val p = math.pow(10, s)
    (if (x >= 0) math.floor(x * p + 0.5) else math.ceil(x * p - 0.5)).toLong.toDouble / p
  }

  def sqlDround(e: String, s: Int): String = {
    val p = s"1e$s"
    s"(CAST(CAST(CASE WHEN ($e) >= 0 THEN FLOOR(($e)*$p+0.5) ELSE CEIL(($e)*$p-0.5) END AS BIGINT) AS DOUBLE)/$p)"
  }

  /** Exact integer micros sum (order-independent, overflow-safe). */
  def msum(c: Column): Column = sum(micros(c).cast(D380))

  /** Exact micros count-less conversion: micros decimal/long -> double/1e6. */
  def toUnits(m: Column): Column = m.cast(DoubleType) / lit(1000000.0)

  /** Order-independent fractional sum emitted as a bit-portable double.
    * Inputs must be finite (the testdata contract): Spark's non-ANSI
    * double->long cast and DuckDB's HUGEINT cast diverge on NaN/Inf.
    *
    * Encoding: each value splits into integer units (trunc, exact) and
    * fractional micros (half-away rounding of the exact remainder), and
    * the two parts sum as NATIVE LONG aggregates — measured 2x faster
    * than summing DECIMAL(38,0) micros, whose precision > 18 forces
    * Spark onto BigDecimal adds per row despite the "long-backed"
    * folklore. The parts combine into DECIMAL(38,0) micros once per
    * GROUP, so overflow safety at 100 TB is preserved as long as each
    * per-group long partial stays under 2^63: SUM(units) < 9.2e18 and
    * SUM(frac_micros) <= count * 1e6 — satisfied for money-scale
    * columns (1e5) up to ~10^13 rows per group. For squared or
    * otherwise wide-magnitude inputs use msum (exact at any scale).
    */
  def dsum(c: Column): Column = toUnits(msumSplit(c))

  /** dsum's internals pre-division: the units/frac split summed to the
    * exact integer-micros DECIMAL(38,0). ONE definition shared with any
    * consumer that needs the exact decimal itself (q11's global window
    * total) — an inlined copy could silently desync from dsum and break
    * the Spark-vs-sqlDsum bit-parity contract. [[sqlMsumSplit]] is the
    * oracle twin.
    */
  def msumSplit(c: Column): Column = {
    val u = when(c >= 0, floor(c)).otherwise(ceil(c)).cast(LongType) // trunc, exact
    val f = micros(c - u.cast(DoubleType)) // exact remainder (|c| < 2^52), rounded
    sum(u).cast(D380) * lit(1000000L) + sum(f).cast(D380)
  }

  /** Order-independent fractional mean emitted as a bit-portable double.
    * Divides by the non-null count (standard SQL AVG semantics), matching
    * COUNT(e) in the oracle fragment.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  // --- DuckDB oracle fragments mirroring the exact same arithmetic ---

  def sqlMicros(e: String): String =
    s"CAST(CASE WHEN ($e) >= 0 THEN FLOOR(($e)*1000000+0.5) ELSE CEIL(($e)*1000000-0.5) END AS HUGEINT)"

  def sqlMsum(e: String): String = s"SUM(${sqlMicros(e)})"

  /** Mirror of dsum's units/frac split: toward-zero integer part spelled
    * as CASE/FLOOR/CEIL (parses in BOTH engines — DuckDB's 1-arg TRUNC
    * does not exist in Spark, and the passthrough spec runs these texts
    * through Spark's parser), exact remainder, two SUMs widened to
    * HUGEINT.
    */
  def sqlMsumSplit(e: String): String = {
    val u = s"(CASE WHEN ($e) >= 0 THEN FLOOR($e) ELSE CEIL($e) END)"
    val rem = s"(($e) - $u)"
    val f = s"CASE WHEN $rem >= 0 THEN FLOOR($rem*1000000+0.5) ELSE CEIL($rem*1000000-0.5) END"
    s"(SUM(CAST($u AS HUGEINT)) * 1000000 + SUM(CAST($f AS HUGEINT)))"
  }

  /** HUGEINT -> DOUBLE routed through VARCHAR: DuckDB's direct
    * HUGEINT->DOUBLE composes the two 64-bit halves and is not guaranteed
    * correctly rounded past 2^53, while its string->double (fast_float)
    * is — matching Spark's correctly-rounded Decimal.toDouble at any
    * magnitude (the 100 TB sums exceed 2^53).
    */
  def sqlToUnits(m: String): String = s"(CAST(CAST($m AS VARCHAR) AS DOUBLE)/1000000.0)"

  def sqlDsum(e: String): String = sqlToUnits(sqlMsumSplit(e))

  def sqlDavg(e: String): String = s"(${sqlDsum(e)}/COUNT($e))"
}
