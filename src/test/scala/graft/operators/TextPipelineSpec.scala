package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants for the round-7 pipeline additions (pack1 sequence
  * packing, cont1 benchmark decontamination). Value-level correctness is
  * hash-checked against the DuckDB oracle by the driver gate; these pin
  * the structural properties the oracle compare can't express.
  */
class TextPipelineSpec extends SparkTestBase {

  test("pack1: offsets stay inside the budget and bins are dense from 0 per shard") {
    val budget = 512
    val packed = TextAnalysis.sequencePacking(spark, sfDir, budget).cache()
    assert(packed.filter(col("seq_offset") < 0 || col("seq_offset") >= budget).isEmpty,
      "every start offset must lie in [0, budget)")
    assert(packed.filter(col("seq_bin") < 0).isEmpty)
    // the first document of every language shard starts bin 0 at offset 0
    val firsts = packed.groupBy(col("lang")).agg(min(col("doc_id")).as("doc_id"))
      .join(packed, Seq("lang", "doc_id"))
    assert(firsts.filter(col("seq_bin") =!= 0 || col("seq_offset") =!= 0).isEmpty)
    // bins within a shard are non-decreasing in doc_id order and skip at
    // most when a document overflows its bin (start-offset rule)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val monotone = packed
      .withColumn("prev_bin", lag(col("seq_bin"), 1).over(w))
      .filter(col("prev_bin").isNotNull && col("seq_bin") < col("prev_bin"))
    assert(monotone.isEmpty, "bins must be non-decreasing per shard")
    packed.unpersist()
  }

  test("pack2: waste audit of a hand-packed shard (600+500 tokens into 512-budget bins)") {
    // One lang 'xx', token counts 300, 300, 500 in doc_id order:
    // cum starts 0/300/600 -> bins 0/0/1. bin0 holds 600 tokens
    // (overflow 88), bin1 holds 500 (pad 12). n_bins 2, total 1100,
    // fill_rate 1100/1024.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pack2fix").toString
    def textOf(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    Seq((1L, textOf(300), "xx", "s1"), (2L, textOf(300), "xx", "s1"),
      (3L, textOf(500), "xx", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.packingWaste(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_bins") == 2L)
    assert(row.getAs[Long]("total_tokens") == 1100L)
    assert(row.getAs[Long]("overflow_tokens") == 88L,
      s"bin0 carries 600 of 512 -> 88 overflow, got ${row.getAs[Long]("overflow_tokens")}")
    assert(row.getAs[Long]("pad_tokens") == 12L,
      s"bin1 carries 500 of 512 -> 12 pad, got ${row.getAs[Long]("pad_tokens")}")
    assert(row.getAs[Double]("fill_rate") == 1100.0 / 1024.0)
  }

  test("shuf2: interleave audit rates are exact on a two-source corpus") {
    // The audit's arithmetic is pinned against a BRUTE-FORCE recompute
    // of the same shuffle order (shuf1 is already spec'd as a
    // permutation): per shard, count adjacent same-source pairs by
    // walking the positions in order.
    val audit = TextAnalysis.interleaveAudit(spark, sfDir).collect()
      .map(r => r.getAs[Int]("shard") -> r).toMap
    val order = TextAnalysis.globalShuffle(spark, sfDir)
      .join(graft.Engine.table(spark, sfDir, "documents").select(col("doc_id"), col("source")), "doc_id")
      .select(col("shard"), col("pos"), col("source")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val bySh = order.groupBy(_._1)
    assert(audit.keySet == bySh.keySet)
    val total = order.length
    val sumC2 = order.groupBy(_._3).values.map(g => g.size.toLong * g.size).sum
    for ((sh, rows) <- bySh) {
      val seq = rows.sortBy(_._2).map(_._3)
      val same = seq.zip(seq.tail).count { case (a, b) => a == b }
      val r = audit(sh)
      assert(r.getAs[Long]("n_docs") == seq.length.toLong)
      assert(r.getAs[Long]("n_same_adj") == same.toLong,
        s"shard $sh: audit says ${r.getAs[Long]("n_same_adj")}, brute force $same")
      assert(r.getAs[Double]("same_rate") == same.toDouble / (seq.length - 1))
      assert(r.getAs[Double]("expected_rate") == sumC2.toDouble / (total.toLong * total))
    }
  }

  test("iaa1: Cohen's kappa of a hand-labeled 4-doc corpus is exactly 0.2") {
    // truth en/en/de/de; predictions en/unknown/de/en ->
    // po = 2/4; marginals A: en 2, de 2; B: en 2, de 1, unknown 1;
    // pe_num = 2*2 + 2*1 = 6; kappa = (4*2-6)/(16-6) = 0.2.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("iaa1fix").toString
    Seq(
      (1L, "the and of", "en", "s1"),
      (2L, "zzz qqq www", "en", "s1"),
      (3L, "der und ist", "de", "s1"),
      (4L, "the to is", "de", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val r = Analytics.labelAgreement(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4L && r.getAs[Long]("n_agree") == 2L)
    assert(r.getAs[Double]("po") == 0.5)
    assert(r.getAs[Double]("pe") == 0.375)
    assert(r.getAs[Double]("kappa") == 0.2,
      s"kappa must be exactly (8-6)/(16-6) = 0.2, got ${r.getAs[Double]("kappa")}")
  }

  test("smp1: per-language keep rates land near their targets and the keep set is stable") {
    val docs = graft.Engine.table(spark, sfDir, "documents")
    val kept = TextAnalysis.stratifiedSample(spark, sfDir).cache()
    val totals = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBy = kept.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    TextAnalysis.sampleRates.foreach { case (lang, rate) =>
      val total = totals.getOrElse(lang, 0L)
      if (total >= 20) {
        val got = keptBy.getOrElse(lang, 0L).toDouble / total
        // md5 fractions are uniform: expect the rate within a generous
        // binomial tolerance at these counts
        assert(math.abs(got - rate) < 0.25, f"$lang: kept $got%.2f vs rate $rate")
      }
    }
    // determinism: a second evaluation yields the identical keep set
    val again = TextAnalysis.stratifiedSample(spark, sfDir)
    assert(kept.select(col("doc_id")).except(again.select(col("doc_id"))).isEmpty)
    assert(again.select(col("doc_id")).except(kept.select(col("doc_id"))).isEmpty)
    kept.unpersist()
  }

  test("cont2: audit rows are benchmark docs only; pair counts bound doc counts") {
    val a = TextAnalysis.benchmarkLeakage(spark, sfDir).cache()
    // each (doc, shingle) pair involves >= 1 doc, so pairs bound docs
    assert(a.filter(col("n_leaky_docs") > col("n_overlap_pairs")).isEmpty)
    assert(a.filter(col("n_leaky_docs") <= 0).isEmpty,
      "only benchmark docs with at least one leak appear")
    // every audited id is actually in the held-out slice
    val benchIds = graft.Engine.table(spark, sfDir, "documents")
      .filter(col("source") === "src0").select(col("doc_id").as("bench_id"))
    assert(a.select(col("bench_id")).except(benchIds).isEmpty,
      "audit ids are a subset of the src0 benchmark slice")
    a.unpersist()
  }

  test("cont1: fractions well-formed; self-overlap never counts as contamination") {
    val c = TextAnalysis.benchmarkContamination(spark, sfDir).cache()
    assert(c.filter(col("n_contaminated") > col("n_shingles")).isEmpty)
    assert(c.filter(col("contamination") < 0.0 || col("contamination") > 1.0).isEmpty)
    // a benchmark doc whose shingles are all unique to itself must read 0
    // (self-matches excluded); verify via a synthetic unique-text check:
    // every doc's contamination is 0 unless SOME OTHER doc shares a
    // shingle with the benchmark slice — spot-check with the raw join
    val sh = Dedup.shingles(spark, sfDir)
    val bench = graft.Engine.table(spark, sfDir, "documents")
      .filter(col("source") === "src0").select(col("doc_id").as("bench_id"))
    val benchSh = sh.join(bench, col("doc_id") === col("bench_id"))
      .select(col("shingle"), col("bench_id"))
    val expectNonZero = sh.join(benchSh, "shingle")
      .filter(col("doc_id") =!= col("bench_id"))
      .select(col("doc_id")).distinct().count()
    assert(c.filter(col("contamination") > 0.0).count() == expectNonZero,
      "exactly the docs sharing a shingle with the benchmark (excluding self) are contaminated")
    c.unpersist()
  }

  test("chunk1: spans tile each document — full coverage, correct overlap, budget cap") {
    val budget = 32; val overlap = 8; val step = budget - overlap
    val chunks = TextAnalysis.docChunks(spark, sfDir, budget, overlap).cache()
    val docs = graft.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n"))
    // every chunk starts on the stepped grid and respects the budget
    assert(chunks.filter((col("start_tok") - 1) % step =!= 0).isEmpty)
    assert(chunks.filter(col("n_chunk_tokens") > budget || col("n_chunk_tokens") < 1).isEmpty)
    // last chunk of each doc reaches exactly the document's end
    val last = chunks.groupBy(col("doc_id"))
      .agg(max(col("start_tok") + col("n_chunk_tokens") - 1).as("covered"))
      .join(docs, "doc_id")
    assert(last.filter(col("covered") =!= col("n")).isEmpty,
      "chunk spans must cover every token exactly to the end")
    // no redundant spans: a chunk starting past n - overlap would lie
    // entirely inside its predecessor
    assert(chunks.join(docs, "doc_id")
      .filter(col("start_tok") > 1 && col("start_tok") > col("n") - overlap).isEmpty,
      "no chunk may be fully contained in the previous one")
    chunks.unpersist()
  }

  test("lm1 / ev10: conditional probability mass per context is ~1e6 before top-k") {
    // rebuild the un-truncated pair counts the operators aggregate from
    val pairs = TextAnalysis.bigramLm(spark, sfDir, k = Int.MaxValue)
      .groupBy(col("w1")).agg(sum(col("p_micro")).as("mass"))
    // per-pair half-up rounding drifts the total by at most #successors/2
    val off = pairs.filter(abs(col("mass") - 1000000L) > 50L)
    assert(off.isEmpty, off.collect().mkString(","))
    val trans = Relational.eventTransitions(spark, sfDir)
      .groupBy(col("prev_type")).agg(sum(col("p_micro")).as("mass"))
      .filter(abs(col("mass") - 1000000L) > 50L)
    assert(trans.isEmpty)
  }

  test("sel1: English documents score higher under the English-target model") {
    val w = TextAnalysis.dsirWeights(spark, sfDir)
      .join(graft.Engine.table(spark, sfDir, "documents").select(col("doc_id"), col("lang")), "doc_id")
    val means = w.groupBy(col("lang") === "en").agg(avg(col("dsir_mean")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} must exceed non-en ${means(false)}")
  }

  test("smp3: rates are capped at 1 and kept counts move shares toward uniform") {
    val kept = TextAnalysis.mixtureBalance(spark, sfDir).cache()
    assert(kept.filter(col("rate") > 1.0 || col("rate") <= 0.0).isEmpty)
    val docs = graft.Engine.table(spark, sfDir, "documents")
    val before = docs.groupBy(col("lang")).count().collect().map(_.getLong(1))
    val after = kept.groupBy(col("lang")).count().collect().map(_.getLong(1))
    def spread(xs: Array[Long]) = xs.max.toDouble / math.max(1L, xs.min)
    assert(spread(after) < spread(before),
      s"balancing must narrow the language spread: ${spread(before)} -> ${spread(after)}")
    kept.unpersist()
  }

  test("rep1: per-(source,lang) totals reconcile with the corpus") {
    val rep = TextAnalysis.corpusReport(spark, sfDir)
    val total = rep.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    val docs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(total == docs, s"report covers $total of $docs docs")
    assert(rep.filter(col("n_kept") > col("n_docs")).isEmpty)
  }

  test("prof1: key column distincts equal the row count, no nulls in testdata") {
    val prof = Relational.tableProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n, nulls, distinct) = prof("o_orderkey")
    assert(distinct == n && nulls == 0L, s"o_orderkey: $prof")
    assert(prof("o_orderstatus")._3 < n, "low-cardinality column stays low")
  }
}
