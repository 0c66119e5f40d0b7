package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class AdmitDoc(doc_id: Long, text: String, lang: String, source: String)

class StreamingDedupSpec extends SparkTestBase {

  import Streams._
  private type Doc = AdmitDoc
  private def Doc(id: Long, text: String, lang: String, source: String) =
    AdmitDoc(id, text, lang, source)

  test("incrementalAdmission: cross-batch exact+near rejection with bounded probe state") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_admit")
    val state = AdmissionState.create(spark, root)
    val mem = MemoryStream[Doc]
    // 40-token base text; the near-dup variant changes only the last
    // token, sharing 35/38 shingles -> most of the 8 LSH bands collide
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearOfBase = (1 to 39).map(i => s"tok$i").mkString(" ") + " other"
    val fresh2 = (100 to 140).map(i => s"word$i").mkString(" ")

    // batch 1: A admits; B is A verbatim (exact_in_batch); C admits;
    // D is a near-dup of... C? D shares C's shingles
    mem.addData(
      Doc(1, base, "en", "crawl1"),
      Doc(2, base.replace(" ", "  "), "en", "crawl1"), // whitespace-run variant == dd1 exact dup of 1
      Doc(3, fresh2, "en", "crawl1"),
      Doc(4, nearOfBase, "en", "crawl1")) // near-dup of 1 within the batch
    val q = Streams.incrementalAdmission(mem.toDF(), state, root.resolve("ckpt").toString)
    try {
      q.processAllAvailable()
      val v1 = state.verdicts.df.collect().map(r =>
        r.getLong(1) -> (r.getBoolean(2), Option(r.getString(3)).getOrElse(""))).toMap
      assert(v1(1L) == (true, ""))
      assert(v1(2L) == (false, "exact_in_batch"), s"got ${v1(2L)}")
      assert(v1(3L) == (true, ""))
      assert(v1(4L) == (false, "near_in_batch"), s"got ${v1(4L)}")

      // batch 2: E is batch-1 A verbatim (exact_vs_corpus), F is a
      // near-dup of admitted A (near_vs_corpus), G is fresh (admit)
      mem.addData(
        Doc(5, base, "en", "crawl2"),
        Doc(6, nearOfBase, "en", "crawl2"),
        Doc(7, (200 to 240).map(i => s"new$i").mkString(" "), "en", "crawl2"))
      q.processAllAvailable()
      val v2 = state.verdicts.df.filter("batch_id = 1").collect().map(r =>
        r.getLong(1) -> (r.getBoolean(2), Option(r.getString(3)).getOrElse(""))).toMap
      assert(v2(5L) == (false, "exact_vs_corpus"), s"got ${v2(5L)}")
      assert(v2(6L) == (false, "near_vs_corpus"), s"got ${v2(6L)}")
      assert(v2(7L) == (true, ""))

      // the corpus holds exactly the admitted documents
      val corpusIds = state.corpus.df.collect().map(_.getLong(0)).sorted.toSeq
      assert(corpusIds == Seq(1L, 3L, 7L))
      // BOUNDED state: probe tables carry keys only, proportional to the
      // admitted corpus — one hash and lshBands band rows per admitted
      // doc, and nothing for any rejected doc
      assert(state.hashes.df.count() == 3)
      assert(state.bands.df.count() == 3L * graft.operators.Dedup.lshBands)
      assert(!state.bands.schema.fieldNames.contains("text"),
        "band state must never carry document text")

      // a replayed (already-verdicted) batch is a no-op
      Streams.admitBatch(
        Seq(Doc(1, base, "en", "crawl1")).toDF(), 0L, state)
      assert(state.corpus.df.count() == 3 && state.verdicts.df.count() == 7)
    } finally q.stop()
  }

  test("admitBatch: near-corpus threshold is per corpus document, not across them") {
    // dd12's pair semantics: rejection needs >= 2 shared bands with ONE
    // corpus document. A batch doc sharing one band with corpus doc 900
    // and another band with corpus doc 901 must be ADMITTED (the first
    // draft aggregated bands across all corpus docs and rejected it).
    val sparkS = spark
    import sparkS.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_admit_pc")
    val state = AdmissionState.create(spark, root)
    val text = (1 to 40).map(i => s"pcd$i").mkString(" ")
    val doc = Seq(AdmitDoc(50L, text, "en", "c")).toDF()
    val keys = graft.operators.Dedup.bandedKeysOf(doc).collect()
      .map(r => (r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(keys.length >= 2)
    state.bands.insert(Seq(
      (900L, keys(0)._1, keys(0)._2),
      (901L, keys(1)._1, keys(1)._2)).toDF("doc_id", "band", "band_key"))
    Streams.admitBatch(doc, 7L, state)
    val v = state.verdicts.df.collect()
    assert(v.length == 1 && v(0).getBoolean(2),
      s"one shared band each with two different corpus docs must admit: ${v.mkString}")
  }

  test("admitBatch: a NULL-text document still gets a verdict (NULL-safe canonical hash)") {
    // the old inline hash was NULL for NULL text, and the NULL key fell
    // out of every hash-keyed join — the doc got NEITHER an admit nor a
    // reject row, violating the every-doc-gets-a-verdict contract (and
    // an all-NULL batch left no verdicts, so the replay guard never
    // marked it processed). Dedup.canonicalHash hashes NULL to a
    // tab-delimited sentinel group: never NULL, and DISTINCT from the
    // empty string (dd1 contract, ADVICE r17: NULL ≢ '' — empty text is
    // a real value; NULL-text docs duplicate only each other).
    val sparkS = spark
    import sparkS.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_admit_null")
    val state = AdmissionState.create(spark, root)
    val batch = Seq(
      AdmitDoc(1L, null, "en", "c"),
      AdmitDoc(2L, "", "en", "c"), // a REAL (empty) value: its own group
      AdmitDoc(3L, (1 to 40).map(i => s"nn$i").mkString(" "), "en", "c"),
      AdmitDoc(4L, null, "en", "c")).toDF() // second NULL: dups doc 1
    Streams.admitBatch(batch, 11L, state)
    val v = state.verdicts.df.collect().map(r =>
      r.getLong(1) -> (r.getBoolean(2), Option(r.getString(3)).getOrElse(""))).toMap
    assert(v.keySet == Set(1L, 2L, 3L, 4L), s"every doc needs a verdict row: ${v.keySet}")
    assert(v(1L) == (true, ""), "first NULL doc admits")
    assert(v(2L) == (true, ""), "empty text is NOT the NULL group — admits")
    assert(v(3L) == (true, ""))
    assert(v(4L) == (false, "exact_in_batch"), "second NULL doc duplicates the first")
    // the replay guard sees the batch as processed even for degenerate batches
    Streams.admitBatch(batch, 11L, state)
    assert(state.verdicts.df.count() == 4)
  }

  test("admitBatch: a crash inside the state writes applies NOTHING; replay is clean") {
    // r12 ADVICE: the old insert sequence could crash after corpus/
    // hashes/bands landed but before verdicts, so the replay re-judged
    // the batch against its own documents and recorded wrong
    // exact_vs_corpus rejections. The four inserts now ride one
    // CatalogTxn: abort the commit before it becomes durable and the
    // whole round vanishes.
    val sparkS = spark
    import sparkS.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_admit_crash")
    val state = AdmissionState.create(spark, root)
    val text = (1 to 40).map(i => s"cra$i").mkString(" ")
    val batch = Seq(
      AdmitDoc(10L, text, "en", "c"),
      AdmitDoc(11L, (50 to 90).map(i => s"oth$i").mkString(" "), "en", "c")).toDF()
    state.catalog.failBeforeCommitRecord = () => throw new RuntimeException("injected")
    try intercept[RuntimeException](Streams.admitBatch(batch, 3L, state))
    finally state.catalog.failBeforeCommitRecord = () => ()
    assert(state.corpus.df.count() == 0 && state.hashes.df.count() == 0 &&
      state.bands.df.count() == 0 && state.verdicts.df.count() == 0,
      "a crashed batch must leave NO partial state")
    // the replay (same batch id) runs as if for the first time: both
    // docs admit — no phantom exact_vs_corpus self-rejections
    Streams.admitBatch(batch, 3L, state)
    val v = state.verdicts.df.collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(v == Map(10L -> true, 11L -> true), s"replay must admit both, got $v")
    assert(state.corpus.df.count() == 2)
  }

  test("streamingDedup drops duplicate keys within the watermark horizon") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamingDedup(mem.toDF(), Seq("event_id"), horizon = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 09:$m%02d:00")
      mem.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(1, ts(1), 1, "view", 1.0), // dup within horizon -> dropped
        Event(2, ts(2), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(3), 1, "view", 1.0)) // still within horizon -> dropped
      q.processAllAvailable()
      val ids = spark.table("dedup_out").as[Event].collect().map(_.event_id).sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("admission state: per-batch file growth folds under compact(); probe state intact") {
    // the 100×-state shape (VERDICT r17 #7): state ROWS grow with the
    // admitted corpus by design, but the per-batch INSERT pattern grows
    // each state table's FILE count monotonically — compact() is the
    // operational bound, and it must not change one verdict
    val sparkS = spark
    import sparkS.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_admit_compact")
    val state = AdmissionState.create(spark, root)
    (0 until 5).foreach { b =>
      val text = (1 to 40).map(i => s"b${b}t$i").mkString(" ")
      Streams.admitBatch(Seq(AdmitDoc(b.toLong, text, "en", "c")).toDF(), b.toLong, state)
    }
    val grown = state.stateFileCount
    assert(grown >= 15, s"5 admitted batches stage >= 3 files each: $grown")
    state.compact()
    val folded = state.stateFileCount
    assert(folded <= 4, s"compaction folds each state table to one file: $folded")
    // the folded state still remembers batch 0's document: a verbatim
    // replay under a NEW id and batch must reject exact_vs_corpus
    val dup = (1 to 40).map(i => s"b0t$i").mkString(" ")
    Streams.admitBatch(Seq(AdmitDoc(99L, dup, "en", "c")).toDF(), 50L, state)
    val v = state.verdicts.df.filter($"doc_id" === 99L).collect()
    assert(v.length == 1 && !v(0).getBoolean(2) && v(0).getString(3) == "exact_vs_corpus",
      s"compacted state must still reject the corpus duplicate: ${v.mkString}")
  }
}
