package graft.operators

import graft.SparkTestBase

/** Hand fixtures for the round-15 operators: pmi1 (PMI collocations),
  * ks1 (two-sample KS distance per source pair), leak1 (cross-split
  * near-dup leakage). Each pins exact values computed by hand — the
  * DuckDB oracle is the third anchor, checked by the driver gate.
  */
class Round15OpsSpec extends SparkTestBase {

  test("pmi1: hand-computed PMI, min-count floor, short-doc bigram edge") {
    import spark.implicits._
    // tokens: a x5, b x5 (doc 1), z x1 (doc 2) -> Nt = 11
    // bigrams: (a,b) x5, (b,a) x4 -> Nb = 9; doc 2 contributes none
    // (the one-token doc exercises the empty-bigram slice edge)
    val dir = java.nio.file.Files.createTempDirectory("pmi1").toString
    Seq((1L, "a b a b a b a b a b"), (2L, "z"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.pmiCollocations(spark, dir).collect()
    // (b,a) has c12 = 4 < 5: the min-count floor drops it
    assert(rows.length == 1, s"only (a,b) reaches min count: ${rows.mkString(";")}")
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("a", "b", 5L))
    // the operator's exact IEEE tree: ln((c12/Nb) / ((c1/Nt)(c2/Nt))),
    // micros-rounded half-away
    val pmi = math.log((5.0 / 9.0) / ((5.0 / 11.0) * (5.0 / 11.0)))
    val expected = math.floor(pmi * 1e6 + 0.5) / 1e6
    assert(r.getDouble(3) == expected, s"got ${r.getDouble(3)}, want $expected")
  }

  test("ks1: hand-computed KS distance between two length distributions") {
    import spark.implicits._
    // A = {1,2,3}, B = {2,4}: CDFs on grid {1,2,3,4} are
    // A: 1/3, 2/3, 1, 1  B: 0, 1/2, 1/2, 1 -> D = |1 - 1/2| = 0.5 at v=3
    val dir = java.nio.file.Files.createTempDirectory("ks1").toString
    Seq(("A", 1L), ("A", 2L), ("A", 3L), ("B", 2L), ("B", 4L))
      .toDF("source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Analytics.sourceKs(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.5, s"KS distance must be exactly 0.5, got ${r.getDouble(4)}")
  }

  test("ks1: identical distributions have zero distance") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ks1z").toString
    Seq(("A", 5L), ("A", 9L), ("B", 5L), ("B", 9L))
      .toDF("source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Analytics.sourceKs(spark, dir).collect()
    assert(rows.length == 1 && rows.head.getDouble(4) == 0.0)
  }

  test("gram3: debut buckets and novelty rates by hand") {
    import spark.implicits._
    // max_id = 19 -> bucket = doc_id*10/20: docs 0,1 -> bucket 0;
    // docs 18,19 -> bucket 9. Shingles: doc 0 and doc 18 share
    // 'a b c'; doc 1 brings 'x y z'; doc 19 brings 'p q r'.
    val dir = java.nio.file.Files.createTempDirectory("gram3").toString
    Seq(
      (0L, "a b c"), (1L, "x y z"),
      (18L, "a b c"), (19L, "p q r"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.ngramNovelty(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(0, 9))
    assert(rows(0) == ((2L, 2L, 1.0)), s"bucket 0 debuts both grams: ${rows(0)}")
    // bucket 9 sees 2 distinct grams but only 'p q r' is new -> 0.5
    assert(rows(9) == ((2L, 1L, 0.5)), s"bucket 9: ${rows(9)}")
  }

  test("leak1: fold-pair tallies match an independent recomputation of dd3 x fld1") {
    import spark.implicits._
    // 4 identical docs -> all 8 LSH bands agree pairwise -> C(4,2) = 6
    // candidate pairs; 2 clearly-distinct docs -> no candidates
    val dup = "the quick brown fox jumps over the lazy dog again"
    val dir = java.nio.file.Files.createTempDirectory("leak1").toString
    Seq(
      (1L, dup, "en"), (2L, dup, "en"), (3L, dup, "de"), (4L, dup, "fr"),
      (5L, "completely different words live here tonight", "en"),
      (6L, "unrelated text about ships and harbors ashore", "en"))
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = Dedup.splitLeakage(spark, dir).collect()
    assert(out.map(_.getLong(2)).sum == 6L, "exactly the C(4,2) duplicate pairs")
    // independent tally: folds from fld1 (its own spec + oracle anchor
    // it), pairs known by construction
    val fold = Analytics.kfoldSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val expected = (for {
      a <- Seq(1L, 2L, 3L); b <- Seq(2L, 3L, 4L) if a < b
    } yield (math.min(fold(a), fold(b)), math.max(fold(a), fold(b))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = out.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"got $got want $expected")
    // shares are n/total and sum to ~1
    out.foreach(r => assert(r.getDouble(3) == r.getLong(2).toDouble / 6.0))
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-12)
  }
}
