package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Value anchors for the operators the r12 oracle-independence audit
  * found to be HASH-PARITY ONLY (no spec touched their builder): each
  * test pins either a hand-computed fixture value or an independent
  * recomputation, so a construction error shared with the mirrored
  * DuckDB oracle can no longer pass silently. Companion to
  * StatFixtureSpec (the statistical readouts).
  */
class ValuePinSpec extends SparkTestBase {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("pinfix").toFile.getPath

  private def writeDocs(dir: String, rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("ev11: z of a planted anomaly is exactly sqrt(7) (counts 1x7 + 9)") {
    // One event type over 8 hours with counts (1,1,1,1,1,1,1,9):
    // mean = 2, population var = (7*1 + 81)/8 - 4 = 7, sd = sqrt(7),
    // z(9) = (9-2)/sqrt(7) = sqrt(7) = 2.6457513... > 2.5 -> emitted;
    // z(1) = -1/sqrt(7) = -0.378 -> filtered. Exactly ONE row.
    import spark.implicits._
    val dir = freshDir()
    val events = (0 until 7).map { h =>
      (h.toLong, Timestamp.valueOf(f"2024-01-01 $h%02d:30:00"), 1L, "click", 0.0, "{}")
    } ++ (0 until 9).map { i =>
      (100L + i, Timestamp.valueOf(s"2024-01-01 07:${10 + i}:00"), 1L, "click", 0.0, "{}")
    }
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Relational.eventAnomalies(spark, dir).collect()
    assert(rows.length == 1, s"only the planted hour may flag, got ${rows.length}")
    assert(rows(0).getAs[Long]("cnt") == 9L)
    assert(math.abs(rows(0).getAs[Double]("z") - math.sqrt(7.0)) < 1e-12,
      s"z must be sqrt(7), got ${rows(0).getAs[Double]("z")}")
  }

  test("ev8: week-0 anchors the cohort size; offsets count the right actives") {
    // u1 events in week W and W+1; u2 in week W only ->
    // (W, 0): 2 active users, 3 events; (W, 1): 1 active, 1 event.
    import spark.implicits._
    val dir = freshDir()
    Seq(
      (1L, Timestamp.valueOf("2024-01-04 10:00:00"), 10L, "view", 0.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-04 11:00:00"), 20L, "view", 0.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-05 10:00:00"), 10L, "view", 0.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-11 10:00:00"), 10L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Relational.cohortRetention(spark, dir).collect()
    assert(rows.length == 2)
    val byOff = rows.map(r => r.getAs[Long]("week_offset") -> r).toMap
    assert(byOff(0L).getAs[Long]("active_users") == 2L && byOff(0L).getAs[Long]("n_events") == 3L)
    assert(byOff(1L).getAs[Long]("active_users") == 1L && byOff(1L).getAs[Long]("n_events") == 1L)
    assert(rows.map(_.getAs[Long]("cohort_week")).distinct.length == 1)
  }

  test("out1: a planted orthogonal vector is the top outlier with cos_r 0.3162") {
    // Label 1: three [1,0] and one [0,1]. Centroid = [0.75, 0.25],
    // |c| = sqrt(0.625) = 0.7905694. cos([0,1], c) = 0.25/0.7905694 =
    // 0.3162278 -> round4 = 0.3162; the [1,0] vectors score
    // 0.75/0.7905694 = 0.9487. The planted vector must rank 1.
    import spark.implicits._
    val dir = freshDir()
    Seq((0L, Seq(1.0, 0.0), 1), (1L, Seq(1.0, 0.0), 1),
      (2L, Seq(1.0, 0.0), 1), (3L, Seq(0.0, 1.0), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.embeddingOutliers(spark, dir).collect()
    val top = rows.find(_.getAs[Long]("outlier_rank") == 1L).get
    assert(top.getAs[Long]("vec_id") == 3L, "the orthogonal vector must rank first")
    assert(top.getAs[Double]("cos_r") == 0.3162)
  }

  test("sim5: endpoint and constant vectors quantize with zero error") {
    // [2,2,2]: rng = 0 -> all codes 0, mean_abs_err 0.
    // [0,1]: codes (0, 255) reconstruct the endpoints exactly ->
    // code_sum 255, mean_abs_err 0.
    import spark.implicits._
    val dir = freshDir()
    Seq((0L, Seq(2.0, 2.0, 2.0), 1), (1L, Seq(0.0, 1.0), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.embeddingQuantization(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getAs[Long]("code_sum") == 0L)
    assert(rows(0L).getAs[Double]("mean_abs_err") == 0.0)
    assert(rows(1L).getAs[Long]("code_sum") == 255L)
    assert(rows(1L).getAs[Double]("mean_abs_err") == 0.0)
  }

  test("sim5: mean reconstruction error is bounded by one quantization step (real corpus)") {
    Similarity.embeddingQuantization(spark, sfDir).collect().foreach { r =>
      val step = (r.getAs[Double]("vmax") - r.getAs[Double]("vmin")) / 255.0
      assert(r.getAs[Double]("mean_abs_err") <= step + 1e-9,
        s"vec ${r.getLong(0)}: err ${r.getAs[Double]("mean_abs_err")} > step $step")
    }
  }

  test("smp2: per-language sample counts are exactly min(cap, language size)") {
    val cap = 100
    val langTotals = graft.Engine.table(spark, sfDir, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = TextAnalysis.languageCap(spark, sfDir, cap).collect()
    val byLang = sampled.groupBy(_.getString(1))
    assert(byLang.keySet == langTotals.keySet)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(cap.toLong, langTotals(lang)),
        s"$lang: ${rows.length} != min($cap, ${langTotals(lang)})")
      assert(rows.map(_.getAs[Long]("sample_rank")).sorted.toSeq ==
        (1L to rows.length.toLong), s"$lang ranks must be dense from 1")
    }
  }

  test("span1: spans are 5-gram shingles repeated in at least minDocs documents") {
    val rows = TextAnalysis.repeatedSpans(spark, sfDir).collect()
    assert(rows.length <= 25)
    assert(rows.nonEmpty, "the corpus repeats boilerplate 5-grams")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 3L)
      assert(r.getString(0).split(" ").length == 5, s"'${r.getString(0)}' is not a 5-gram")
    }
  }

  test("mem1: risky grams, risky docs, and fractions on a hand-built 5-doc corpus") {
    // 5-grams: d1 {"a b c d e","b c d e f"}, d2 {"a b c d e"},
    // d3 {"a b c d e","b c d e x"}, d4 {"z y x w v"}, d5 none (<5 toks).
    // Only "a b c d e" reaches minDocs=3 (d1,d2,d3).
    // s1 = {d1,d2}: total 3 grams, 2 risky, both docs risky -> frac 2/3.
    // s2 = {d3,d4,d5}: total 3 grams, 1 risky, 1 risky doc -> frac 1/3.
    val dir = freshDir()
    writeDocs(dir, Seq(
      (1L, "a b c d e f", "en", "s1"),
      (2L, "a b c d e", "en", "s1"),
      (3L, "a b c d e x", "en", "s2"),
      (4L, "z y x w v", "en", "s2"),
      (5L, "short one", "en", "s2")))
    val rows = TextAnalysis.memorizationRisk(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("s1", "s2"))
    val s1 = rows(0); val s2 = rows(1)
    assert(s1.getAs[Long]("n_docs") == 2L && s1.getAs[Long]("n_risky_docs") == 2L)
    assert(s1.getAs[Long]("total_grams") == 3L && s1.getAs[Long]("risky_grams") == 2L)
    assert(s1.getAs[Double]("risky_frac") == 2.0 / 3.0)
    assert(s2.getAs[Long]("n_docs") == 3L && s2.getAs[Long]("n_risky_docs") == 1L)
    assert(s2.getAs[Long]("total_grams") == 3L && s2.getAs[Long]("risky_grams") == 1L)
    assert(s2.getAs[Double]("risky_frac") == 1.0 / 3.0)
  }

  test("mem1: real-corpus invariants — risky subsets bounded, fraction in [0,1]") {
    val rows = TextAnalysis.memorizationRisk(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_risky_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("risky_grams") <= r.getAs[Long]("total_grams"))
      if (!r.isNullAt(r.fieldIndex("risky_frac"))) {
        val f = r.getAs[Double]("risky_frac")
        assert(f >= 0.0 && f <= 1.0)
      }
    }
  }

  test("tok1: OOV ratio is exactly 6/30 when 6 of 30 singleton tokens fall past the cut") {
    // One doc of 30 distinct tokens t01..t30, all tf = 1: the top-24
    // vocabulary keeps t01..t24 (tf ties break token-ascending), so
    // n_oov = 6 and oov_ratio = 0.2 exactly.
    val dir = freshDir()
    writeDocs(dir, Seq((1L, (1 to 30).map(i => f"t$i%02d").mkString(" "), "en", "s1")))
    val r = TextAnalysis.vocabCoverage(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 30L)
    assert(r.getAs[Long]("n_oov") == 6L)
    assert(r.getAs[Double]("oov_ratio") == 0.2)
  }

  test("txt3: fingerprint equals an independently computed md5 prefix") {
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "Hello  World", "en", "s1")))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest("hello world".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 16)
    val r = TextAnalysis.docFingerprint(spark, dir).collect()(0)
    assert(r.getString(1) == expected,
      s"fingerprint ${r.getString(1)} != MessageDigest-derived $expected")
    assert(r.getAs[Int]("n_chars_actual") == 12)
  }

  test("txt4: GPT-2-style segmentation of 'a bb 12 !' is 4 pieces (2 words, 1 digit run)") {
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "a bb 12 !", "en", "s1")))
    val r = TextAnalysis.docBpeTokens(spark, dir).collect()(0)
    assert(r.getAs[Int]("n_bpe_pieces") == 4, s"got ${r.getAs[Int]("n_bpe_pieces")}")
    assert(r.getAs[Int]("n_word_pieces") == 2)
    assert(r.getAs[Int]("n_digit_pieces") == 1)
  }

  test("txt5: rolling hash matches an independent Horner loop over the documented formula") {
    // h = fold(codepoints of whitespace-normalized lowercase text):
    // h' = (h*131 + cp) mod 1e9+7 — recomputed here with a plain Scala
    // loop, independent of both engines' array-fold expressions.
    val dir = freshDir()
    val text = "Ab  cD e"
    writeDocs(dir, Seq((1L, text, "en", "s1")))
    val normalized = text.toLowerCase.replaceAll("\\s+", " ")
    val expected = normalized.foldLeft(0L)((h, ch) => (h * 131 + ch.toInt) % 1000000007L)
    val r = TextAnalysis.docRollingHash(spark, dir).collect()(0)
    assert(r.getAs[Long]("rolling_hash") == expected,
      s"hash ${r.getAs[Long]("rolling_hash")} != Horner-loop $expected")
  }

  test("txt7: corpus token counts on a hand corpus are exact") {
    // docs "a a b" + "b c" -> a:2, b:2, c:1, ranked (count desc, token asc)
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "a a b", "en", "s1"), (2L, "b c", "en", "s2")))
    val rows = TextAnalysis.topTokens(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n")))
    assert(rows.toSeq == Seq(("a", 2L), ("b", 2L), ("c", 1L)), rows.mkString(","))
  }

  test("txt9: repetition fractions of 'a a b' are (1/3 dup tokens, 0 dup bigrams)") {
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "a a b", "en", "s1"), (2L, "x x x x", "en", "s1")))
    val rows = TextAnalysis.docRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(math.abs(rows(1L).getAs[Double]("dup_token_frac") - 1.0 / 3) < 1e-12)
    assert(rows(1L).getAs[Double]("dup_bigram_frac") == 0.0)
    // "x x x x": 1 distinct of 4 -> 0.75; bigrams all "x x" -> 1 of 3 -> 2/3
    assert(rows(2L).getAs[Double]("dup_token_frac") == 0.75)
    assert(math.abs(rows(2L).getAs[Double]("dup_bigram_frac") - 2.0 / 3) < 1e-12)
  }

  test("txt10: richness of 'a a b' is (ttr 2/3, hapax ratio 1/2)") {
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "a a b", "en", "s1")))
    val r = TextAnalysis.docVocabRichness(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 3L && r.getAs[Long]("n_types") == 2L)
    assert(r.getAs[Long]("n_hapax") == 1L)
    assert(math.abs(r.getAs[Double]("type_token_ratio") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Double]("hapax_ratio") == 0.5)
  }

  test("txt8: deflate byte counts pin to zlib level-6 reference values") {
    // txt8 has NO DuckDB oracle (DuckDB ships no deflate), so these
    // constants anchor the VALUES, not just the shape. They were
    // computed with an INDEPENDENT deflate implementation — CPython's
    // zlib.compress(data, 6) — whose output length java.util.zip's
    // Deflater(6) must reproduce exactly (both are madler-zlib at the
    // same level/strategy, verified byte-identical out of band):
    //   "a"*1000                      1000 -> 17
    //   "The quick brown fox ..."*4    180 -> 55
    //   "x"                              1 ->  9
    //   "9f8e7d6c5b4a3210"*8           128 -> 27
    //   "to be or not to be ..."*25   1000 -> 53
    val dir = freshDir()
    writeDocs(dir, Seq(
      (1L, "a" * 1000, "en", "s1"),
      (2L, "The quick brown fox jumps over the lazy dog. " * 4, "en", "s1"),
      (3L, "x", "en", "s1"),
      (4L, "9f8e7d6c5b4a3210" * 8, "en", "s1"),
      (5L, "to be or not to be that is the question " * 25, "en", "s1")))
    val rows = TextAnalysis.compressionRatio(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_bytes"), r.getAs[Int]("n_compressed"), r.getAs[Double]("ratio"))).toMap
    val expected = Map(
      1L -> (1000, 17), 2L -> (180, 55), 3L -> (1, 9), 4L -> (128, 27), 5L -> (1000, 53))
    for ((id, (nb, nc)) <- expected) {
      val (gotB, gotC, gotR) = rows(id)
      assert(gotB == nb, s"doc $id n_bytes: got $gotB want $nb")
      assert(gotC == nc, s"doc $id n_compressed: got $gotC want $nc (zlib-6 reference)")
      assert(math.abs(gotR - nc.toDouble / nb) < 1e-15)
    }
    // ordering sanity of the quality signal itself: repetitive text
    // compresses far below natural text, which compresses below hex noise
    assert(rows(1L)._3 < rows(5L)._3 && rows(5L)._3 < rows(2L)._3 && rows(2L)._3 < rows(4L)._3 * 2)
  }

  test("txt1: token stats of 'The cat sat' by hand") {
    // tokens [the, cat, sat]: n 3, chars 11, nonspace 9,
    // avg_token_len 3.0, one stopword ('the') -> ratio 1/3
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "The cat sat", "en", "s1")))
    val r = TextAnalysis.docTokenStats(spark, dir).collect()(0)
    assert(r.getAs[Int]("n_tokens") == 3 && r.getAs[Int]("n_chars_actual") == 11)
    assert(r.getAs[Int]("n_nonspace") == 9)
    assert(r.getAs[Double]("avg_token_len") == 3.0)
    assert(r.getAs[Int]("n_stopwords") == 1)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 1.0 / 3) < 1e-12)
  }

  test("txt2: marker-stuffed documents classify to their language; no markers -> unknown") {
    val dir = freshDir()
    writeDocs(dir, Seq(
      (1L, "the and of to is", "en", "s1"),
      (2L, "der die das und ist", "de", "s1"),
      (3L, "zzz qqq www", "en", "s1")))
    val rows = TextAnalysis.docLangId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    assert(rows(1L) == "en" && rows(2L) == "de" && rows(3L) == "unknown")
  }

  test("txt6: hand-crafted documents trip exactly the expected rule bits") {
    val dir = freshDir()
    writeDocs(dir, Seq(
      // 10 tokens, mean len 31/10 = 3.1, no symbols, has stopwords -> keep
      (1L, "the cat sat on a mat with some fine words", "en", "s1"),
      // 2 tokens (bit 1) and zero stopwords (bit 32) -> mask 33
      (2L, "hi there", "en", "s1"),
      // 5 tokens, mean len 3, symbol ratio 15/19 > 0.3 (bit 16), no
      // stopwords (bit 32) -> mask 48
      (3L, "$$$ %%% ^^^ &&& ***", "en", "s1")))
    val rows = TextAnalysis.docQualityFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep") && rows(1L).getAs[Int]("drop_reasons") == 0)
    assert(rows(2L).getAs[Int]("drop_reasons") == 33, s"got ${rows(2L).getAs[Int]("drop_reasons")}")
    assert(rows(3L).getAs[Int]("drop_reasons") == 48, s"got ${rows(3L).getAs[Int]("drop_reasons")}")
  }

  test("txt11: mean -log p of 'a a b' equals (2 ln(3/2) + ln 3)/3") {
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "a a b", "en", "s1")))
    val r = TextAnalysis.docUnigramLogProb(spark, dir).collect()(0)
    val expected = (2 * math.log(1.5) + math.log(3.0)) / 3
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(math.abs(r.getAs[Double]("mean_neg_logp") - expected) < 5e-6,
      s"${r.getAs[Double]("mean_neg_logp")} != $expected")
  }

  test("txt12: tf-idf micros scores on a two-document hand corpus") {
    // d1 'apple apple banana', d2 'banana cherry'. N = 2; df apple 1,
    // banana 2, cherry 1; idf micros: ln2 -> 693147, ln1 -> 0.
    // d1 top term: apple, score 2*693147 = 1386294; d2: cherry 693147.
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "apple apple banana", "en", "s1"),
      (2L, "banana cherry", "en", "s2")))
    val rows = TextAnalysis.docTfidf(spark, dir).collect()
    val d1r1 = rows.find(r => r.getLong(0) == 1L && r.getAs[Long]("term_rank") == 1L).get
    assert(d1r1.getAs[String]("tok") == "apple" && d1r1.getAs[Long]("score_m") == 1386294L)
    val d2r1 = rows.find(r => r.getLong(0) == 2L && r.getAs[Long]("term_rank") == 1L).get
    assert(d2r1.getAs[String]("tok") == "cherry" && d2r1.getAs[Long]("score_m") == 693147L)
  }

  test("bpe2: hand-traced merge sequence on the corpus {aaab, aab}") {
    // Vocab: aaab (1), aab (1).
    // iter 1: pairs (a,a) x3 [(a,a),(a,a) in aaab + (a,a) in aab],
    //         (a,b) x2 -> merge (a,a) -> 'aa', count 3.
    //         Greedy rewrite: aaab -> [aa,a,b], aab -> [aa,b].
    // iter 2: (aa,a) 1, (a,b) 1, (aa,b) 1 -> tie on count, 'a' < 'aa'
    //         -> merge (a,b) -> 'ab', count 1. aaab -> [aa,ab].
    // iter 3: (aa,ab) 1, (aa,b) 1 -> tie, 'ab' < 'b'
    //         -> merge (aa,ab) -> 'aaab', count 1.
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "aaab aab", "en", "s1")))
    val rows = TextAnalysis.bpeMergeTraining(spark, dir, iters = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "a", "b", "ab", 1L),
      (3, "aa", "ab", "aaab", 1L)), rows.mkString(", "))
  }

  test("tok5: encoding {aaab aab} with 2 learned merges gives 4 pieces over 7 chars") {
    // merges after 2 iterations (see the bpe2 trace): (a,a)->aa, (a,b)->ab.
    // aaab -> [aa, ab] (2 pieces), aab -> [aa, b] (2 pieces).
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "aaab aab", "en", "s1")))
    val r = TextAnalysis.bpeEncode(spark, dir, iters = 2).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 2L)
    assert(r.getAs[Long]("n_chars") == 7L)
    assert(r.getAs[Long]("n_pieces") == 4L, s"got ${r.getAs[Long]("n_pieces")}")
    assert(r.getAs[Double]("pieces_per_token") == 2.0)
  }

  test("cont3: a 13-token verbatim span drops the doc; 12 shared tokens do not") {
    // bench doc (src0) holds span w1..w13. Doc 2 embeds the full span
    // verbatim -> exactly one 13-gram collision -> drop. Doc 3 shares
    // only w1..w12 -> no 13-gram can match -> keep.
    val span = (1 to 13).map(i => s"w$i").mkString(" ")
    val dir = freshDir()
    writeDocs(dir, Seq(
      (1L, span + " tailb1 tailb2", "en", "src0"),
      (2L, "lead2 " + span + " tail2", "en", "src1"),
      (3L, "lead3 " + (1 to 12).map(i => s"w$i").mkString(" ") + " other tail3", "en", "src1")))
    val rows = TextAnalysis.exactNgramDecontam(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(1L), "bench docs are not audited against themselves")
    assert(rows(2L).getAs[Boolean]("drop"), "verbatim 13-gram leak must drop")
    assert(rows(2L).getAs[Long]("n_hit") >= 1L)
    assert(!rows(3L).getAs[Boolean]("drop"), "a 12-token share is below the gate")
    assert(rows(3L).getAs[Long]("n_hit") == 0L)
  }

  test("tok6: Heaps curve by hand ('a b' then 'a c' -> (2,2) then (4,3)) and monotone on corpus") {
    val dir = freshDir()
    writeDocs(dir, Seq((1L, "a b", "en", "s1"), (2L, "a c", "en", "s1")))
    val fix = TextAnalysis.heapsCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fix.toSeq == Seq((1L, 2L, 2L), (2L, 4L, 3L)), fix.mkString(","))
    // corpus invariants: both sums strictly/weakly monotone, vocab <= tokens,
    // final vocab == the corpus's distinct token count
    val rows = TextAnalysis.heapsCurve(spark, sfDir).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) > a.getLong(1) && b.getLong(2) >= a.getLong(2))
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val distinct = graft.Engine.table(spark, sfDir, "documents")
      .selectExpr("explode(split(lower(trim(text)), '\\\\s+')) AS t")
      .distinct().count()
    assert(rows.last.getLong(2) == distinct)
  }

  test("pipe1: composite verdicts are exactly the conjunction of their anchored stages") {
    val manifest = CorpusPipeline.corpusManifest(spark, sfDir).collect()
    assert(manifest.length == 500)
    manifest.foreach { r =>
      val q = r.getAs[Boolean]("keep_quality"); val c = r.getAs[Boolean]("keep_decontam")
      val d = r.getAs[Boolean]("keep_dedup"); val sm = r.getAs[Boolean]("keep_sample")
      assert(r.getAs[Boolean]("final_keep") == (q && c && d && sm))
      val expectedStage =
        if (!q) "quality" else if (!c) "decontamination"
        else if (!d) "dedup" else if (!sm) "sampling" else null
      assert(Option(r.getAs[String]("drop_stage")).orNull == expectedStage)
    }
    // cross-anchor: the dedup column IS dd8's (itself spec-verified)
    val dd8 = Dedup.dedupKeepList(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    manifest.foreach(r =>
      assert(r.getAs[Boolean]("keep_dedup") == dd8(r.getLong(0))))
  }

  test("pipe2: the training mix packs exactly pipe1's survivors within budget") {
    val manifest = CorpusPipeline.corpusManifest(spark, sfDir).collect()
    val survivors = manifest.filter(_.getAs[Boolean]("final_keep")).map(_.getLong(0)).toSet
    val mix = CorpusPipeline.trainingMix(spark, sfDir).collect()
    assert(mix.map(_.getLong(0)).toSet == survivors,
      "the mix must contain exactly the manifest's survivors")
    mix.foreach { r =>
      assert(r.getAs[Long]("seq_offset") >= 0 &&
        r.getAs[Long]("seq_offset") < 512, "offsets stay inside the token budget")
    }
  }
}
