package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCRATCH A/B lab for round 21 — NOT part of the engine; deleted (or
  * left uncommitted) once the measured variant lands in the operator.
  * Usage: runMain graft.Lab21 <variant> [reps]
  */
object Lab21 {
  import graft.operators.Par.BoundedOrder

  def t(s: SparkSession, dir: String, name: String): DataFrame = Engine.table(s, dir, name)

  // stat4 variants -----------------------------------------------------------
  /** r20 shape: raw-row RANGE window (current tree). */
  def stat4A(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wTot = Window.partitionBy(col("l_returnflag"))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .withColumn("cum", sum(col("l_quantity")).over(wCum))
      .withColumn("tot", sum(col("l_quantity")).over(wTot))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("weighted_median_price"),
        max(col("tot")).as("total_qty"))
      .orderedSmall(col("l_returnflag"))
  }

  /** classic r19 shape: groupBy pre-aggregate feeding the window. */
  def stat4B(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wTot = Window.partitionBy(col("l_returnflag"))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(sum(col("l_quantity")).as("w"))
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wTot))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("weighted_median_price"),
        max(col("tot")).as("total_qty"))
      .orderedSmall(col("l_returnflag"))
  }

  /** pre-pinned (flag,price) exchange at width np: partial+final agg run
    * PARALLEL above the exchange (no serial 600k-group partial in the
    * single-row-group scan task), then the level-bounded flag exchange.
    */
  def stat4C(np: Int)(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wTot = Window.partitionBy(col("l_returnflag"))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .repartition(np, col("l_returnflag"), col("l_extendedprice"))
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(sum(col("l_quantity")).as("w"))
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wTot))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("weighted_median_price"),
        max(col("tot")).as("total_qty"))
      .orderedSmall(col("l_returnflag"))
  }

  /** single flag exchange shared by agg + window (agg runs 3-task). */
  def stat4E(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wTot = Window.partitionBy(col("l_returnflag"))
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .repartition(col("l_returnflag"))
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(sum(col("l_quantity")).as("w"))
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wTot))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("weighted_median_price"),
        max(col("tot")).as("total_qty"))
      .orderedSmall(col("l_returnflag"))
  }

  // mem1 single-pass variant: gram_docs via count window over the gram
  // (the cont3 pattern) — no groupBy+join branch, tokenize runs once by
  // construction instead of relying on ReusedExchange.
  def mem1W(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val n = 5; val minDocs = 3
    val sh = graft.operators.Dedup.shingles(s, dir, n)
      .withColumn("gram_docs", count(lit(1)).over(Window.partitionBy(col("shingle"))))
    val perDoc = sh.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast(LongType).as("n_grams"),
        sum(when(col("gram_docs") >= minDocs, 1L).otherwise(0L)).as("n_risky"))
    t(s, dir, "documents").select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        sum(when(col("n_risky") > 0, 1L).otherwise(0L)).as("n_risky_docs"),
        coalesce(sum(col("n_grams")), lit(0L)).as("total_grams"),
        coalesce(sum(col("n_risky")), lit(0L)).as("risky_grams"))
      .select(col("source"), col("n_docs"), col("n_risky_docs"),
        col("total_grams"), col("risky_grams"),
        when(col("total_grams") > 0,
          col("risky_grams").cast(DoubleType) / col("total_grams").cast(DoubleType))
          .as("risky_frac"))
      .orderBy(col("source"))
  }

  // cont1 single-pass variant: bench membership tagged by broadcast,
  // contamination via a bench-count window over the shingle hash.
  def cont1W(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val bench = t(s, dir, "documents").filter(col("source") === "src0")
      .select(col("doc_id"), lit(true).as("is_bench"))
    val sh = graft.operators.Dedup.shingles(s, dir)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      .join(broadcast(bench), Seq("doc_id"), "left")
      .withColumn("is_bench", coalesce(col("is_bench"), lit(false)))
    val w = Window.partitionBy(col("h"))
    sh.withColumn("n_bench", sum(when(col("is_bench"), 1L).otherwise(0L)).over(w))
      .withColumn("contam",
        (col("n_bench") - when(col("is_bench"), 1L).otherwise(0L)) > 0)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("contam"), 1L).otherwise(0L)).as("n_contaminated"))
      .select(col("doc_id"),
        col("n_shingles").cast(LongType).as("n_shingles"),
        col("n_contaminated").cast(LongType).as("n_contaminated"),
        (col("n_contaminated").cast(DoubleType) / col("n_shingles")).as("contamination"))
      .orderBy(col("doc_id"))
  }

  // dd5 decomposition probes + variants -------------------------------------
  import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
  import graft.operators.{Similarity, Exact, Dedup, Par}

  private def dd5Cand(s: SparkSession, dir: String, prePin: Boolean): (DataFrame, Int) = {
    val e = Par.fanOut(t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v")))
    val np = Par.shuffleWidth(e)
    val idx0 = Similarity.lshBuckets(e, Dedup.ndTables, Dedup.ndPlanes)
      .select(col("vec_id"), col("tbl"), col("bucket"))
    val idx = if (prePin) idx0.repartition(np, col("tbl"), col("bucket")) else idx0
    val cand = idx.select(col("vec_id").as("id_a"), col("tbl"), col("bucket"))
      .join(idx.select(col("vec_id").as("id_b"), col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    (cand, np)
  }

  /** probe: raw candidate-pair volume before/after distinct */
  def dd5Counts(s: SparkSession, dir: String): DataFrame = {
    val (cand, _) = dd5Cand(s, dir, prePin = true)
    val pre = cand.count()
    val post = cand.distinct().count()
    s.createDataFrame(Seq((pre, post))).toDF("pre_distinct", "post_distinct")
  }

  /** index+pairs+distinct only (no vector join): isolates the LSH/dedup cost */
  def dd5NoDot(s: SparkSession, dir: String): DataFrame = {
    val (cand, np) = dd5Cand(s, dir, prePin = true)
    cand.repartition(np, col("id_a"), col("id_b")).distinct()
      .agg(count(lit(1)).as("n"))
  }

  /** current registry shape */
  def dd5A(s: SparkSession, dir: String): DataFrame = Dedup.embeddingNearDup(s, dir)

  /** probe: index only */
  def dd5Idx(s: SparkSession, dir: String): DataFrame = {
    val e = Par.fanOut(t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v")))
    Similarity.lshBuckets(e, Dedup.ndTables, Dedup.ndPlanes)
      .select(col("vec_id"), col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }
  /** probe: candidate join only, no distinct */
  def dd5CandOnly(s: SparkSession, dir: String): DataFrame = {
    val (cand, _) = dd5Cand(s, dir, prePin = true)
    cand.agg(count(lit(1)).as("n"))
  }

  /** W: both pinned exchanges at machine width */
  def dd5W(s: SparkSession, dir: String): DataFrame = {
    val e = Par.fanOut(t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v")))
    val en = e.withColumn("nrm", Similarity.dot(col("v"), col("v")))
    val wide = math.max(Par.shuffleWidth(e), s.sparkContext.defaultParallelism)
    val idx = Similarity.lshBuckets(e, Dedup.ndTables, Dedup.ndPlanes)
      .select(col("vec_id"), col("tbl"), col("bucket"))
      .repartition(wide, col("tbl"), col("bucket"))
    val cand = idx.select(col("vec_id").as("id_a"), col("tbl"), col("bucket"))
      .join(idx.select(col("vec_id").as("id_b"), col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .repartition(wide, col("id_a"), col("id_b"))
      .distinct()
    dd5Dots(en, cand, 0.3)
  }

  private def dd5Dots(en: DataFrame, cand: DataFrame, threshold: Double): DataFrame =
    cand
      .join(en.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(en.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cos", Similarity.dot(col("va"), col("vb")) / sqrt(col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), Exact.dround(col("cos"), 6).as("cos_sim"))
      .orderBy(col("id_a"), col("id_b"))

  /** B: partial-dedup below the distinct exchange (groupBy, no pre-pin of
    * the pair exchange), dot width re-pinned after. */
  def dd5B(s: SparkSession, dir: String): DataFrame = {
    val e = Par.fanOut(t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v")))
    val en = e.withColumn("nrm", Similarity.dot(col("v"), col("v")))
    val (cand, np) = dd5Cand(s, dir, prePin = true)
    val ded = cand.groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("_m"))
      .select(col("id_a"), col("id_b"))
      .repartition(np, col("id_a"), col("id_b"))
    dd5Dots(en, ded, 0.3)
  }

  /** D: current shape, dot stage pinned WIDE (defaultParallelism). */
  def dd5D(s: SparkSession, dir: String): DataFrame = {
    val e = Par.fanOut(t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("v")))
    val en = e.withColumn("nrm", Similarity.dot(col("v"), col("v")))
    val wide = math.max(Par.shuffleWidth(e), s.sparkContext.defaultParallelism)
    val (cand, np) = dd5Cand(s, dir, prePin = true)
    val ded = cand.repartition(wide, col("id_a"), col("id_b")).distinct()
    dd5Dots(en, ded, 0.3)
  }

  // dd17 tier probes ---------------------------------------------------------
  def dd17ex(s: SparkSession, dir: String): DataFrame = {
    val exW = Window.partitionBy(col("h"))
    t(s, dir, "documents")
      .select(col("doc_id"), Dedup.canonicalHash.as("h"))
      .withColumn("a", min(col("doc_id")).over(exW))
      .filter(col("a") < col("doc_id"))
      .select(col("a").as("doc_a"), col("doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n"))
  }
  def dd17lsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(s, dir).filter(col("n_band_hits") >= 2)
      .select(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n"))

  /** wide variant of the minhash tier: docs fanned to machine width
    * before the shingle explode + 32 md5 partial-min aggregate. */
  private def minhashLshWide(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = split(lower(trim(col("text"))), "\\s+")
    val n = 3
    val sh = Par.fanOutWide(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("toks"), i + k)): _*))
      ).as("shingle"))
    Dedup.lshPairsOf(Dedup.bandedKeysOfSig(Dedup.minhashSignatures(sh)))
  }
  def dd17lshW(s: SparkSession, dir: String): DataFrame =
    minhashLshWide(s, dir).filter(col("n_band_hits") >= 2)
      .select(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n"))

  /** wide variant of the simhash tier */
  def dd17shW(s: SparkSession, dir: String): DataFrame = {
    val toks = Par.fanOutWide(t(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast(LongType))
    val votes = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i")
    }
    val sig = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map { i =>
          when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L)
        }.reduce(_.bitwiseOR(_)).as("simhash"))
    val chunks = sig.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(c => shiftrightunsigned(col("simhash"), c * 15).bitwiseAND(0x7FFF)): _*))
      .as(Seq("chunk", "chunk_val")))
    val pinned = chunks.repartition(Par.shuffleWidth(sig), col("chunk"), col("chunk_val"))
    val a = pinned.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"), col("chunk"), col("chunk_val"))
    val b = pinned.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"), col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast(IntegerType))
      .filter(col("hamming") <= 8)
      .select(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n"))
  }
  def dd17sh(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(s, dir).filter(col("hamming") <= 8)
      .select(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n"))
  def dd17full(s: SparkSession, dir: String): DataFrame =
    Dedup.multiTierClusters(s, dir)

  // bsk2 variants -------------------------------------------------------------
  /** current registry shape (single-task partial collect_set in the scan task?) */
  def bsk2A(s: SparkSession, dir: String): DataFrame =
    graft.operators.Analytics.associationRules(s, dir)

  /** the grouped-sets aggregate with a pinned orderkey exchange first:
    * no serial partial collect_set inside the single-row-group scan task. */
  def bsk2Sets(s: SparkSession, dir: String, mode: String): DataFrame = {
    val li0 = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val li = mode match {
      case "pin"  => li0.repartition(Par.shuffleWidth(li0), col("l_orderkey"))
      case "fan"  => Par.fanOut(li0)
      case "wide" => Par.fanOutWide(li0)
      case _      => li0
    }
    val part = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("p_brand")).as("bs"))
  }
  def bsk2Tokens(sets: DataFrame): DataFrame = {
    val pairTokens = flatten(transform(col("bs"), a =>
      filter(transform(col("bs"), b => when(a < b, concat(a, lit("|"), b))),
        x => x.isNotNull)))
    sets.select(explode(concat(pairTokens, col("bs"), array(lit("*")))).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
  }
  /** probe: the counts aggregate only, per li layout mode */
  def bsk2Probe(mode: String)(s: SparkSession, dir: String): DataFrame =
    bsk2Tokens(bsk2Sets(s, dir, mode)).agg(sum(col("cnt")))

  // stat4 further variants ----------------------------------------------------
  /** pinned pre-agg + ONE window pass: tot as a full-frame expression over
    * the SAME (flag, price-ordered) window spec, so both sums share one
    * Window operator and one sort. */
  def stat4F(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = wCum.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .repartition(Par.shuffleWidth(t(s, dir, "lineitem")),
        col("l_returnflag"), col("l_extendedprice"))
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(sum(col("l_quantity")).as("w"))
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wAll))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("weighted_median_price"),
        max(col("tot")).as("total_qty"))
      .orderedSmall(col("l_returnflag"))
  }

  def stat4F32(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = wCum.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .repartition(graft.operators.Par.wideWidth(t(s, dir, "lineitem")),
        col("l_returnflag"), col("l_extendedprice"))
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(sum(col("l_quantity")).as("w"))
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("tot", sum(col("w")).over(wAll))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("weighted_median_price"),
        max(col("tot")).as("total_qty"))
      .orderedSmall(col("l_returnflag"))
  }

  /** raw-row window but with the one-window-pass trick (r20 shape + merged tot) */
  def stat4G(s: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = wCum.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .withColumn("cum", sum(col("l_quantity")).over(wCum))
      .withColumn("tot", sum(col("l_quantity")).over(wAll))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("weighted_median_price"),
        max(col("tot")).as("total_qty"))
      .orderedSmall(col("l_returnflag"))
  }

  /** Split a prepared re-execution into plan-time vs run-time: usage
    * runMain graft.Lab21 split:<query> [reps]
    */
  def splitProbe(spark: SparkSession, sfDir: String, q: String, reps: Int): Unit = {
    import org.apache.spark.sql.graft.PlanReuse
    val df = SparkEntry.queries(q)(spark, sfDir)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val re = PlanReuse.reanalyzed(spark, df)
      PlanReuse.forcePlanned(re)
      val t1 = System.nanoTime()
      re.collect()
      val t2 = System.nanoTime()
      println(f"SPLIT $q rep$i plan ${(t1 - t0) / 1e6}%.1f ms  exec ${(t2 - t1) / 1e6}%.1f ms")
    }
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bsk2A" -> (bsk2A _),
    "bsk2Full" -> ((s: SparkSession, d: String) => {
      // full bsk2 with the pinned orderkey exchange (candidate shape)
      val counts = bsk2Tokens(bsk2Sets(s, d, "pin"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = counts("*").toDouble
      import s.implicits._
      counts.iterator.filter { case (k, _) => k.contains("|") }
        .map { case (k, nAb) =>
          val Array(a, b) = k.split("\\|", 2)
          (a, b, nAb, nAb / counts(a).toDouble, nAb / counts(b).toDouble,
            (nAb * n) / (counts(a).toDouble * counts(b).toDouble))
        }.toSeq.sortBy { case (a, b, _, _, _, lift) => (-lift, a, b) }.take(20)
        .toDF("brand_a", "brand_b", "n_ab", "conf_a_to_b", "conf_b_to_a", "lift")
    }),
    "bsk2Pnone" -> bsk2Probe("none") _,
    "bsk2Ppin" -> bsk2Probe("pin") _,
    "bsk2Pfan" -> bsk2Probe("fan") _,
    "bsk2Pwide" -> bsk2Probe("wide") _,
    "stat4F" -> (stat4F _),
    "stat4F32" -> (stat4F32 _),
    "stat4G" -> (stat4G _),
    "dd5Counts" -> (dd5Counts _),
    "dd5NoDot" -> (dd5NoDot _),
    "dd5A" -> (dd5A _),
    "dd5B" -> (dd5B _),
    "dd5D" -> (dd5D _),
    "dd5W" -> (dd5W _),
    "dd5Idx" -> (dd5Idx _),
    "dd5CandOnly" -> (dd5CandOnly _),
    "dd17ex" -> (dd17ex _),
    "dd17lsh" -> (dd17lsh _),
    "dd17lshW" -> (dd17lshW _),
    "dd17shW" -> (dd17shW _),
    "dd17sh" -> (dd17sh _),
    "dd17full" -> (dd17full _),
    "stat4A" -> (stat4A _),
    "stat4B" -> (stat4B _),
    "stat4C8" -> stat4C(8) _,
    "stat4C32" -> stat4C(32) _,
    "stat4E" -> (stat4E _),
    "mem1W" -> (mem1W _),
    "mem1" -> ((s: SparkSession, d: String) => graft.operators.TextAnalysis.memorizationRisk(s, d)),
    "cont1W" -> (cont1W _),
    "cont1" -> ((s: SparkSession, d: String) => graft.operators.TextAnalysis.benchmarkContamination(s, d)))

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val explain = args.drop(1).headOption.contains("explain")
    val stages = args.contains("stages")
    val reps = args.drop(1).headOption.filterNot(x => x == "explain" || x == "stages")
      .map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.newSession("graft-lab21", Engine.defaultCores,
      extraConf = if (explain) Map("spark.sql.adaptive.enabled" -> "false") else Map.empty)
    spark.sparkContext.setLogLevel("ERROR")
    if (names.forall(_.startsWith("split:"))) {
      names.foreach(n => splitProbe(spark, sfDir, n.stripPrefix("split:"), reps))
      spark.stop(); return
    }
    if (explain) {
      names.foreach { n =>
        println(s"===== $n =====")
        variants(n)(spark, sfDir).explain("formatted")
      }
      spark.stop(); return
    }
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (stages) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
          stageLog.add(f"    stage ${si.stageId}%3d ${ms.getOrElse(-1L)}%6d ms  tasks=${si.numTasks}%3d  ${si.name.take(60)}")
        }
      })
    }
    names.foreach { n =>
      val fn = variants(n)
      var last: Array[org.apache.spark.sql.Row] = null
      stageLog.clear()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        last = fn(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"LAB $n%-10s min ${times.min}%.3f  all ${times.map(x => f"$x%.3f").mkString(" ")}")
      if (last.length <= 6) println(s"  rows: ${last.mkString(" | ")}")
      if (stages) {
        org.apache.spark.sql.graft.bridge.drainListenerBus(spark.sparkContext)
        println(s"  stages (all reps):")
        stageLog.forEach(l => println(l)); stageLog.clear()
      }
    }
    spark.stop()
  }
}
