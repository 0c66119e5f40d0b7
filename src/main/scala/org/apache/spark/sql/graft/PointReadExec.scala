package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BoundReference, EqualTo, GreaterThanOrEqual, LessThanOrEqual, Literal, Predicate, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset, SparkSession => ClassicSparkSession}

/** Plan-free execution for the prepared POINT-READ fast path
  * (graft.Session.pointReadFast).
  *
  * The measured anatomy of a prepared PK-equality SELECT in this engine
  * (round 15, local[32]): the Spark job itself is ~6 ms, but EVERY fresh
  * plan pays ~25-45 ms of analyzer + optimizer + physical planning +
  * whole-stage-codegen work, and a changed key literal regenerates the
  * codegen source (Janino recompile, ~20 ms). A real engine's prepared
  * statement compiles the plan ONCE and re-binds values per execution
  * (the reference does exactly this, prepared.rs:344-372). This is that,
  * Spark-style:
  *
  *  - [[prepareScan]] physically plans the (value-independent) candidate
  *    scan once and keeps its InternalRow RDD — schema projection is in
  *    the plan, so parquet column pruning still applies;
  *  - [[execute]] runs ONE job over the cached RDD, filtering with a
  *    catalyst [[Predicate]] built from the freshly-bound literal (the
  *    generated predicate source is value-independent — the literal
  *    rides the expression object — so Janino caches it), and answers a
  *    LocalRelation DataFrame of the matches.
  *
  * Scale contract: callers bound the candidate set (files AND rows) —
  * within the bound, losing parquet row-group pushdown for the key
  * predicate costs less than one plan compilation; above it, the caller
  * falls back to the fully-planned path, which keeps pushdown.
  */
object PointReadExec {

  /** A physically-planned candidate scan, reusable across executions.
    * The RDD re-reads the (immutable) files on every job — plan reuse,
    * never result reuse.
    */
  final case class CachedScan(rdd: RDD[InternalRow], output: Seq[Attribute])

  def prepareScan(df: DataFrame): CachedScan = {
    val qe = df.asInstanceOf[ClassicDataFrame].queryExecution
    CachedScan(qe.executedPlan.execute(), qe.executedPlan.output)
  }

  /** One job over the cached scan answering PER-FILE match counts for a
    * bound predicate — the copy-on-write DML discovery shape (the file
    * name rides the scan as the `fileOrd` column). Only the counts map
    * crosses the job boundary, never rows, so any candidate volume is
    * driver-safe.
    */
  def matchCountsByFile(spark: SparkSession, scan: CachedScan,
      pred: org.apache.spark.sql.catalyst.expressions.Expression,
      fileOrd: Int): Map[String, Long] = {
    val sc = spark.sparkContext
    if (scan.rdd.getNumPartitions == 0) return Map.empty
    sc.runJob(scan.rdd, (it: Iterator[InternalRow]) => {
      val p = Predicate.create(pred)
      p.initialize(org.apache.spark.TaskContext.getPartitionId())
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      // rows within a split share one file: cache the last decoded name
      var lastRaw: org.apache.spark.unsafe.types.UTF8String = null
      var lastName: String = null
      it.foreach { r =>
        if (p.eval(r)) {
          val raw = r.getUTF8String(fileOrd)
          if (lastRaw == null || !raw.equals(lastRaw)) {
            lastRaw = raw.clone(); lastName = raw.toString
          }
          m(lastName) = m.getOrElse(lastName, 0L) + 1
        }
      }
      m.toMap
    }).foldLeft(Map.empty[String, Long]) { (acc, part) =>
      part.foldLeft(acc) { case (a, (f, n)) => a + (f -> (a.getOrElse(f, 0L) + n)) }
    }
  }

  /** One filtered job over the cached scan: `keyCol = lit` (one literal)
    * or `keyCol BETWEEN lo AND hi` (two), optionally sorted by the key
    * (`sortDesc`: None = unsorted, Some(false/true) = ASC/DESC with
    * Spark's default null placement), projected to `projection` (None =
    * the scan's own output), returned as a local DataFrame. Matches are
    * copied off the scan's reused row buffers before crossing the job
    * boundary.
    */
  def execute(spark: SparkSession, scan: CachedScan, keyCol: String,
      lits: Seq[Literal], projection: Option[Seq[String]],
      sortDesc: Option[Boolean] = None, inList: Boolean = false): DataFrame = {
    val keyOrd = scan.output.indexWhere(_.name.equalsIgnoreCase(keyCol))
    require(keyOrd >= 0, s"key column $keyCol not in scan output")
    val keyAttr = scan.output(keyOrd)
    val ref = BoundReference(keyOrd, keyAttr.dataType, keyAttr.nullable)
    // `inList` is explicit — a 2-literal IN would otherwise be
    // indistinguishable from BETWEEN's (lo, hi) pair
    val pred =
      if (inList) org.apache.spark.sql.catalyst.expressions.In(ref, lits)
      else lits match {
        case Seq(one) => EqualTo(ref, one)
        case Seq(lo, hi) => And(GreaterThanOrEqual(ref, lo), LessThanOrEqual(ref, hi))
        case other => throw new IllegalArgumentException(s"1 or 2 literals, got ${other.size}")
      }
    val sc = spark.sparkContext
    val n = scan.rdd.getNumPartitions
    val matches: Array[InternalRow] =
      if (n == 0) Array.empty
      else sc.runJob(scan.rdd, (it: Iterator[InternalRow]) => {
        val p = Predicate.create(pred)
        p.initialize(org.apache.spark.TaskContext.getPartitionId())
        it.filter(p.eval).map(_.copy()).toArray
      }).flatten
    val sorted: Array[InternalRow] = sortDesc match {
      case None => matches
      case Some(desc) =>
        val dt = keyAttr.dataType
        val valueOrd = org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
        // ASC NULLS FIRST is Spark's default; reversing flips both the
        // direction and the null end, which is exactly DESC NULLS LAST
        val asc: Ordering[InternalRow] = (x: InternalRow, y: InternalRow) => {
          val xn = x.isNullAt(keyOrd); val yn = y.isNullAt(keyOrd)
          if (xn && yn) 0 else if (xn) -1 else if (yn) 1
          else valueOrd.compare(x.get(keyOrd, dt), y.get(keyOrd, dt))
        }
        matches.sorted(if (desc) asc.reverse else asc)
    }
    val outAttrs: Seq[Attribute] = projection match {
      case None => scan.output
      case Some(cols) => cols.map(c => scan.output.find(_.name.equalsIgnoreCase(c)).get)
    }
    val rows: Seq[InternalRow] =
      if (outAttrs == scan.output) sorted.toSeq
      else {
        val proj = UnsafeProjection.create(outAttrs, scan.output)
        sorted.map(r => proj(r).copy(): InternalRow).toSeq
      }
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession],
      LocalRelation(outAttrs.map(_.newInstance()), rows, isStreaming = false, stream = None))
  }
}
