package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants for the sketch/warehouse additions (hll1 HyperLogLog,
  * bf1 Bloom pruning, scd1 SCD2 history, zord1 Z-order layout, ws1
  * weighted sampling, mad1 robust outliers). Value-level correctness is
  * hash-checked against the DuckDB oracle by the driver gate; these pin
  * the structural properties the oracle compare can't express.
  */
class WarehouseSpec extends SparkTestBase {

  test("hll1: registers bounded, estimate positive and within 3/sqrt(m) of exact") {
    val r = Sketches.hllSketch(spark, sfDir).cache()
    assert(r.filter(col("n_registers") > Sketches.hllBuckets).isEmpty)
    assert(r.filter(col("hll_estimate") <= 0).isEmpty)
    // standard error of raw HLL is ~1.04/sqrt(m) = 13%; allow 3 sigma
    // (the linear-counting branch handles the sparse regime)
    assert(r.filter(abs(col("rel_error")) > 0.4).isEmpty,
      "estimate should stay in the HLL error envelope")
    r.unpersist()
  }

  test("hll1: deterministic across runs (md5-seeded, no RNG state)") {
    val a = Sketches.hllSketch(spark, sfDir).collect().toSeq
    val b = Sketches.hllSketch(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("hll2: union estimate dominates singles and set identities hold exactly") {
    val r = Sketches.hllUnion(spark, sfDir).collect()
    assert(r.length == 10, "C(5,2) source pairs")
    r.foreach { row =>
      // exact identities
      val u = row.getAs[Long]("n_exact_union")
      val i = row.getAs[Long]("n_exact_intersect")
      assert(u >= 0 && i >= 0 && i <= u)
      // merged-register union can never estimate below either single's
      // register state would allow; sanity: union est within the HLL
      // envelope of the exact union
      val eu = row.getAs[Double]("hll_union_estimate")
      assert(eu > 0)
      assert(math.abs(eu - u) / math.max(u, 1L) < 0.4,
        s"union estimate $eu vs exact $u out of envelope")
    }
  }

  test("pit1: every purchase is attributed exactly once") {
    val r = Warehouse.pointInTime(spark, sfDir).collect()
    val events = graft.Engine.table(spark, sfDir, "events")
    val nPurch = events.filter(col("event_type") === "purchase").count()
    assert(r.map(_.getAs[Long]("n_purchases")).sum == nPurch,
      "interval attribution must partition the purchase set")
    assert(r.forall(row => row.getAs[Long]("n_users") <= row.getAs[Long]("n_purchases")))
    assert(!r.map(_.getAs[String]("state")).contains("purchase"),
      "states come from the non-purchase islands")
  }

  test("bf1: no false negatives and a sane ledger") {
    val row = Sketches.bloomPrune(spark, sfDir).collect()(0)
    val nProbed = row.getAs[Long]("n_probed")
    val nCand = row.getAs[Long]("n_candidates")
    val nTrue = row.getAs[Long]("n_true")
    val nFp = row.getAs[Long]("n_false_pos")
    // every true member must pass the filter: candidates >= true matches
    assert(nCand >= nTrue, "bloom filters never reject a member")
    assert(nCand == nTrue + nFp, "candidates decompose into true + FP")
    assert(nFp <= nProbed - nTrue)
    assert(row.getAs[Long]("n_bits_set") <= Sketches.bloomBits)
  }

  test("scd1: intervals are disjoint, cover every event, and have one current run per user") {
    val h = Warehouse.scd2History(spark, sfDir).cache()
    val events = graft.Engine.table(spark, sfDir, "events")
    // run event counts sum to the event count
    assert(h.agg(sum(col("n_events"))).collect()(0).getLong(0) == events.count())
    // exactly one open interval per user
    val openPerUser = h.filter(col("is_current") === 1)
      .groupBy(col("user_id")).count().filter(col("count") =!= 1)
    assert(openPerUser.isEmpty)
    // valid_from < valid_to for every closed interval
    assert(h.filter(col("valid_to").isNotNull && col("valid_from") >= col("valid_to")).isEmpty)
    // adjacent runs never share an event_type (they'd be one run)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    val adj = h.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull && col("next_type") === col("event_type"))
    assert(adj.isEmpty, "consecutive runs must change event_type")
    h.unpersist()
  }

  test("zord1: morton blocks cover all rows and bound both dimensions") {
    val z = Warehouse.zorderStats(spark, sfDir).cache()
    val nOrders = graft.Engine.table(spark, sfDir, "orders").count()
    assert(z.agg(sum(col("n_rows"))).collect()(0).getLong(0) == nOrders)
    assert(z.filter(col("z_block") < 0 || col("z_block") > 1023).isEmpty)
    assert(z.filter(col("min_x") > col("max_x") || col("min_y") > col("max_y")).isEmpty)
    // a 64-z-value block spans at most an 8x8 tile in (x, y) space —
    // the locality guarantee that makes the layout prunable
    assert(z.filter(col("bbox_area") > 64).isEmpty,
      "Z-order block bounding boxes must stay tile-local")
    z.unpersist()
  }

  test("zord2: min/max pruning is sound and the Z-layout actually skips blocks") {
    val row = Warehouse.zorderPruneAudit(spark, sfDir).collect()(0)
    assert(row.getAs[Long]("rows_scanned") >= row.getAs[Long]("rows_matching"),
      "pruning must never skip a block containing a matching row")
    assert(row.getAs[Long]("n_blocks_kept") <= row.getAs[Long]("n_blocks_total"))
    // a tile-aligned quarter-space predicate keeps ~1/16 of the blocks;
    // anything under half proves the layout clusters both dimensions
    assert(row.getAs[Double]("prune_ratio") > 0.5,
      s"Z-order should prune most rows, got ${row.getAs[Double]("prune_ratio")}")
  }

  test("cmp1: dictionary estimates beat plain encoding for low-cardinality columns") {
    val r = Warehouse.encodingAdvisor(spark, sfDir).collect()
    assert(r.length == Warehouse.cmpColumns.length)
    r.foreach { row =>
      assert(row.getAs[Long]("n_distinct") <= row.getAs[Long]("n"))
      assert(row.getAs[Long]("dict_bytes") > 0 && row.getAs[Long]("plain_bytes") > 0)
      // these are all handful-of-values columns: dictionary must win
      assert(row.getAs[Double]("compression_ratio") > 1.0,
        s"${row.getAs[String]("column_name")} should dictionary-compress")
    }
  }

  test("fd1: key columns determine, non-keys do not") {
    val r = Warehouse.functionalDeps(spark, sfDir).collect()
      .map(row => (row.getAs[String]("determinant"), row.getAs[Int]("holds"))).toMap
    assert(r("o_orderkey") == 1, "primary key determines every column")
    assert(r("c_custkey") == 1)
    assert(r("n_nationkey") == 1)
    assert(r("c_nationkey") == 0, "25 nations cannot determine 5 segments x 25")
  }

  test("fd1: any-NULL pairs are skipped from the pair-distinct count (NULL parity)") {
    // Spark's countDistinct(det, dep) skips tuples with ANY null; the
    // oracle's CASE-wrapped COUNT(DISTINCT ...) mirrors exactly that
    // (DuckDB's bare COUNT(DISTINCT (a,b)) would COUNT null-field
    // structs and flip the verdict). This fixture pins the Spark-side
    // semantics the oracle text reproduces.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fd1n").toString
    def save(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.parquet(s"$dir/$name.parquet")
    save("orders", Seq(
      (1L, "O", 10L, "P1"),
      (2L, null.asInstanceOf[String], 10L, null.asInstanceOf[String]),
      (3L, "F", 20L, "P2"))
      .toDF("o_orderkey", "o_orderstatus", "o_custkey", "o_orderpriority"))
    save("customer", Seq((10L, 0L, "SEG"), (20L, 1L, "SEG"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment"))
    save("nation", Seq((0L, 0L), (1L, 0L)).toDF("n_nationkey", "n_regionkey"))
    val r = Warehouse.functionalDeps(spark, dir).collect()
      .map(row => (row.getAs[String]("determinant"),
        (row.getAs[Long]("n_det"), row.getAs[Long]("n_det_dep"), row.getAs[Int]("holds"))))
      .toMap
    // o_custkey: dets {10, 20}; pairs skipping NULLs: (10,P1), (20,P2)
    // -> 2 == 2, HOLDS (cust 10's NULL-priority row is skipped, exactly
    // as the oracle's CASE form counts it)
    assert(r("o_custkey") == ((2L, 2L, 1)), r("o_custkey").toString)
    // o_orderkey: det 2's status is NULL -> pair skipped: 3 dets, 2 pairs
    // -> does NOT hold under skip semantics (both engines agree)
    assert(r("o_orderkey") == ((3L, 2L, 0)), r("o_orderkey").toString)
  }

  test("ws1: sample is a deterministic subset, weight-monotone under equal hash") {
    val a = Warehouse.weightedSample(spark, sfDir).collect().toSeq
    val b = Warehouse.weightedSample(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.size <= Warehouse.wsTopN)
    assert(a.map(_.getAs[Long]("priority")).sliding(2).forall {
      case Seq(x, y) => x >= y
      case _         => true
    })
  }

  test("cms1: Count-Min never undercounts and reports the top-N exactly") {
    val r = Sketches.cmsHeavyHitters(spark, sfDir).collect()
    assert(r.length <= Sketches.cmsTopN)
    assert(r.forall(row => row.getAs[Long]("cms_estimate") >= row.getAs[Long]("n_exact")),
      "CMS estimates are one-sided: estimate >= true count always")
    assert(r.forall(_.getAs[Long]("overcount") >= 0))
    val again = Sketches.cmsHeavyHitters(spark, sfDir).collect()
    assert(r.toSeq == again.toSeq)
  }

  test("cms2: inner-product estimate never undercounts the true join size") {
    val row = Sketches.cmsJoinCardinality(spark, sfDir).collect()(0)
    val exact = row.getAs[Long]("exact_join_size")
    val est = row.getAs[Long]("cms_estimate")
    assert(est >= exact, "CMS inner product is a one-sided overestimate")
    assert(row.getAs[Long]("overcount") == est - exact)
    assert(row.getAs[Long]("n_keys_a") > 0 && row.getAs[Long]("n_keys_b") > 0)
  }

  test("ivm1: merged partials equal the direct aggregate (the IVM identity)") {
    val merged = Warehouse.partialMerge(spark, sfDir).collect()
    val direct = graft.Engine.table(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.toUnits(Exact.msum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("o_orderpriority")).collect()
    assert(merged.length == direct.length)
    merged.zip(direct).foreach { case (m, d) =>
      assert(m.getAs[String]("o_orderpriority") == d.getAs[String]("o_orderpriority"))
      assert(m.getAs[Long]("n_orders") == d.getAs[Long]("n_orders"))
      assert(m.getAs[Double]("revenue") == d.getAs[Double]("revenue"),
        "partial merge must be bit-identical to the direct aggregate")
    }
  }

  test("ivm1: NULL order dates ride the base partial — merge still equals recompute (r19 review)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivm_null").toString
    Seq(
      (1L, Option(java.sql.Timestamp.valueOf("1996-06-01 00:00:00")), "1-URGENT", 100.0),
      (2L, Option(java.sql.Timestamp.valueOf("1997-06-01 00:00:00")), "1-URGENT", 50.0),
      (3L, Option.empty[java.sql.Timestamp], "1-URGENT", 25.0)) // neither < nor >= split
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val r = Warehouse.partialMerge(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_orders") == 3L,
      s"NULL-date row must not vanish from the merge: ${r(0)}")
    assert(r(0).getAs[Double]("revenue") == 175.0)
  }

  test("prof3: explicit bracketing lerp equals the textbook percentile on sorted micros (r19 review)") {
    // independently recompute exact_p50/p95 from the sorted micros of
    // each group: h = p(n-1), lerp between v[floor(h)] and v[floor(h)+1]
    val base = graft.Engine.table(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("grp"), Exact.micros(col("o_totalprice")).as("m"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    def textbook(vs: Array[Long], p: Double): Double = {
      val h = p * (vs.length - 1).toDouble
      val k = math.floor(h).toInt
      val a = vs(k).toDouble
      val b = (if (k + 1 < vs.length) vs(k + 1) else vs(k)).toDouble
      (a + (b - a) * (h - math.floor(h))) / 1000000.0
    }
    Warehouse.histogramProfile(spark, sfDir).collect().foreach { row =>
      val vs = base(row.getAs[String]("grp"))
      assert(row.getAs[Double]("exact_p50") == textbook(vs, 0.5),
        s"p50 ${row.getAs[Double]("exact_p50")} vs ${textbook(vs, 0.5)}")
      assert(row.getAs[Double]("exact_p95") == textbook(vs, 0.95),
        s"p95 ${row.getAs[Double]("exact_p95")} vs ${textbook(vs, 0.95)}")
    }
  }

  test("prof3: histogram quantile estimates bracket the exact values within a bucket width") {
    val width = Warehouse.histHi / Warehouse.histBuckets
    val r = Warehouse.histogramProfile(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("est_p50") - row.getAs[Double]("exact_p50")) <= width,
        "p50 estimate must land within one bucket of the exact percentile")
      assert(math.abs(row.getAs[Double]("est_p95") - row.getAs[Double]("exact_p95")) <= width)
      assert(row.getAs[Double]("est_p95") >= row.getAs[Double]("est_p50"))
    }
  }

  test("mad1: outliers bounded, MAD nonnegative, zero-MAD groups flag nothing spuriously") {
    val m = Warehouse.robustOutliers(spark, sfDir).cache()
    assert(m.filter(col("mad_value") < 0).isEmpty)
    assert(m.filter(col("n_outliers") > col("n")).isEmpty)
    // median of |x - median| = 0 means > half the group sits exactly at
    // the median; then outliers are values != median only
    assert(m.filter(col("n_outliers") < 0).isEmpty)
    m.unpersist()
  }
}
