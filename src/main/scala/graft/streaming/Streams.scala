package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface.
  *
  * The reference has no streaming dataflow — its "streaming ingestion"
  * (README.md:38) is micro-batched Arrow DoPut appends
  * (service/handlers/prepared.rs:429-515). Here that ingest path is
  * re-expressed as a real Structured Streaming pipeline (SURVEY §1.1
  * "Streams" row: batch writes, optionally `foreachBatch`), plus the two
  * beyond-reference streaming operators a training-data pipeline needs:
  * watermarked tumbling-window aggregation and stateful sessionization.
  *
  * Scale notes: all three run per-key partition-parallel; state for
  * sessionization is per-user in the state store (RocksDB on a real
  * cluster), watermarks bound its size; the ingest path is exactly-once
  * per file via checkpointed file tracking.
  */
object Streams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)

  case class SessionOut(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Micro-batch file ingest: stream parquet files landing in `sourceDir`
    * into a parquet sink — the reference's DoPut appender loop (A7) as a
    * Structured Streaming job with checkpointed exactly-once file
    * tracking. `foreachBatch` would swap in a MutableTable.insert for
    * PK-checked ingest.
    */
  def fileIngest(spark: SparkSession, sourceDir: String, sinkDir: String,
      checkpointDir: String, schema: org.apache.spark.sql.types.StructType): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Watermarked tumbling-window aggregation over an event stream:
    * 1-hour windows, 30-minute allowed lateness; append mode emits only
    * finalized windows. Mirrors the batch ev1_hourly_windows query.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming upsert into a PK-enforced mutable table: `foreachBatch`
    * gives each micro-batch transactional access to the copy-on-write
    * layer — the batch's keys and rows land via MutableTable.upsertKeys,
    * ONE atomic version commit (a reader never observes the keys-absent
    * state the old delete-then-insert pair published between versions,
    * and a crash mid-batch leaves the previous version; the DoPut
    * appender path, A7, with DuckLake-style mutability instead of
    * append-only). The one-row-per-key pick is a pure function of batch
    * CONTENT: `dropDuplicates` keeps an arbitrary row (task order), so a
    * replayed batch could commit a DIFFERENT row than its first attempt
    * — instead rows rank deterministically per key by `orderBy` (pass an
    * event-time column for latest-wins; default: every non-key column,
    * descending). The key anti-join stays distributed — no key set ever
    * reaches the driver, so batch size is bounded by the cluster.
    */
  def upsertStream(events: DataFrame, table: graft.sources.MutableTable,
      pk: String, checkpointDir: String, orderBy: Seq[String] = Nil): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the caller's orderBy alone is deterministic only when tie-free
        // (two same-pk rows with equal ts but different payloads would be
        // picked arbitrarily, re-introducing the replay hazard) — the
        // remaining non-key columns append as a final content tiebreak
        val ordCols = if (orderBy.nonEmpty)
            orderBy ++ batch.columns.toSeq.filterNot(c => c == pk || orderBy.contains(c))
          else batch.columns.toSeq.filterNot(_ == pk)
        val ord = (if (ordCols.nonEmpty) ordCols else Seq(pk)).map(col(_).desc)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(pk)).orderBy(ord: _*)
        val deduped = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn").cache()
        try {
          if (!deduped.isEmpty) { table.upsertKeys(deduped, pk); () }
        } finally deduped.unpersist()
        ()
      }
      .start()

  /** Streaming exact dedup: drop events whose key was already seen
    * within the watermark horizon — the streaming form of dd1's
    * content-hash dedup (state bounded by the watermark, so the state
    * store never grows past one horizon of keys; at 100 TB/day this is
    * the only dedup shape that doesn't require a full-history shuffle).
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      watermarkCol: String = "ts", horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark(watermarkCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stateful sessionization: 30-minute-gap sessions per user via
    * flatMapGroupsWithState with event-time timeout. A session is emitted
    * when the watermark passes its gap (timeout), giving the same
    * sessions the batch lag/running-sum query (w2_event_sessions)
    * computes retrospectively.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // the 10-minute watermark below must not exceed the gap: then every
    // in-watermark straggler lands within `gap` of the session START
    // too (an event needing a farther-back session would already be
    // below the watermark and filtered), so extending sessionStart
    // backwards via min() reproduces exactly the batch (w2) sessions
    require(gapMinutes >= 10, s"gap ($gapMinutes min) must cover the 10-minute watermark")
    val gapMs = gapMinutes * 60 * 1000L

    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, new Timestamp(s.sessionStart), new Timestamp(s.lastTs), s.nEvents))
      }
      val sorted = batch.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs <= gapMs =>
            // a late-but-in-watermark event can precede the current
            // session start — the session's true start moves DOWN, or
            // the emitted session_start diverges from the batch twin
            cur = Some(s.copy(sessionStart = math.min(s.sessionStart, t),
              lastTs = math.max(s.lastTs, t), nEvents = s.nEvents + 1))
          case Some(s) =>
            closed ::= SessionOut(userId, new Timestamp(s.sessionStart), new Timestamp(s.lastTs), s.nEvents)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastTs + gapMs)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** Streaming corpus-quality router — the §7.5 quality gate meeting the
    * streaming layer: the EXACT txt6 rule mask (operators.TextAnalysis
    * .qualityMask, a pure map-only column expression) applied to a
    * document stream per micro-batch. Downstream a `foreachBatch` routes
    * on `keep` to kept/quarantine sinks; because the expression is
    * map-only, the streaming plan is the batch plan — no state, no
    * shuffle, identical verdicts (pinned by StreamsSpec against the
    * batch txt6 output).
    */
  def qualityRoute(docs: DataFrame): DataFrame =
    docs
      .withColumn("drop_reasons",
        graft.operators.TextAnalysis.qualityMask.cast(org.apache.spark.sql.types.IntegerType))
      .withColumn("keep", col("drop_reasons") === 0)

  /** Watermarked per-source quality rate over a document stream with an
    * arrival timestamp: finalized 10-minute windows of (total, kept) per
    * source — the live drift monitor a crawl pipeline watches (the
    * streaming face of rep1/drift1). Append mode emits only windows the
    * 5-minute watermark has closed.
    */
  def sourceQualityRates(docs: DataFrame): DataFrame =
    qualityRoute(docs)
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_docs"), col("n_kept"))

  /** Sliding-window trending tokens — the live "what is the crawl
    * suddenly full of" monitor. 10-minute windows SLIDING every 5 (the
    * one window shape the other scenarios don't exercise: every token
    * lands in exactly two overlapping windows), 5-minute watermark,
    * stopwords dropped map-side before the count shuffle. Append mode
    * emits only finalized (window, token) counts, so a consumer ranks a
    * window's tokens the moment it closes — the rank itself stays
    * downstream because a per-window top-k inside the stream would need
    * the window to close anyway. Shape at any rate: explode + filter
    * are map-only; the count is one map-side-combinable shuffle keyed
    * on (window, token).
    */
  def trendingTokens(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "5 minutes")
      .select(col("ts"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("tok"))
      .filter(!col("tok").isInCollection(graft.operators.TextAnalysis.stopwords))
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("tok"), col("n"))

  /** Stream-static enrichment: the event stream joined against a static
    * (or slowly refreshing) dimension — the standard lookup-join every
    * streaming feature pipeline starts with. The static side is
    * re-resolved every micro-batch, so a dimension refreshed in place
    * is picked up without restarting the query; wrapping it in
    * broadcast() keeps the stream side shuffle-free (the dimension
    * ships to the executors, the unbounded side never moves). Rows with
    * no dimension match survive with a sentinel — an enrichment join
    * must never drop facts.
    */
  def enrichEvents(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .na.fill("unknown", Seq("segment"))

  /** Persistent dedup state for [[incrementalAdmission]] — dd12's
    * batch-vs-corpus probe lifted to a continuous ingest. Three
    * MutableTables under one root:
    *  - `corpus`: the admitted documents (the ingest sink itself);
    *  - `hashes`: one dd1 content hash per admitted document — the
    *    exact-dup probe state (32 hex chars/doc, never the text);
    *  - `bands`: the admitted documents' (doc_id, band, band_key) LSH
    *    bucket rows — the near-dup probe state (lshBands rows/doc).
    * State is bounded by ADMITTED documents only (rejected ones add
    * nothing), and each probe is batch-restricted: the micro-batch's
    * hashes/bands join the state on their keys — corpus x corpus
    * candidate mass is never generated, the same property dd12 pins.
    */
  final case class AdmissionState(
      catalog: graft.sources.MutableCatalog,
      corpus: graft.sources.MutableTable,
      hashes: graft.sources.MutableTable,
      bands: graft.sources.MutableTable,
      verdicts: graft.sources.MutableTable) {

    /** Operational bound for long-lived admission state (VERDICT r17
      * #7). State ROWS are O(admitted documents) by design — they ARE
      * the dedup memory, and every probe join is key-restricted to the
      * micro-batch, so row growth never costs a corpus×corpus pass.
      * What grows per BATCH is each table's file count (one staged
      * insert per batch per table): at 100× batch cadence the probe
      * side pays thousands of tiny parquet footers per join. This is
      * that growth's compaction path — MutableTable.checkpoint() folds
      * each state table's live files (contents and verdict behavior
      * unchanged, spec-pinned); a deployment calls it every N batches
      * exactly like the reference's CHECKPOINT maintenance job
      * (maintenance/mod.rs:24-223).
      */
    def compact(): Unit =
      Seq(corpus, hashes, bands, verdicts).foreach(_.checkpoint())

    /** Total live parquet files across the four state tables — the
      * quantity [[compact]] bounds (exposed for monitoring and specs).
      */
    def stateFileCount: Int =
      Seq(corpus, hashes, bands, verdicts).map(_.fileCount).sum
  }

  object AdmissionState {
    import org.apache.spark.sql.types._
    // catalog-registered table names (prefixed: the catalog registers a
    // temp view per table, and bare "corpus"/"hashes" would squat on
    // generic view names in the shared session)
    private[streaming] val N = Map(
      "corpus" -> "adm_corpus", "hashes" -> "adm_hashes",
      "bands" -> "adm_bands", "verdicts" -> "adm_verdicts")

    /** The four state tables live in ONE MutableCatalog so admitBatch
      * can stage its inserts in a single transaction — the multi-table
      * atomic commit (durable commit record + roll-forward recovery)
      * makes a crashed batch all-or-nothing instead of replaying wrong
      * exact_vs_corpus verdicts against its own half-applied state.
      */
    def create(spark: SparkSession, root: java.nio.file.Path): AdmissionState = {
      val cat = new graft.sources.MutableCatalog(spark, root)
      AdmissionState(
        catalog = cat,
        corpus = cat.create(N("corpus"), StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType),
          StructField("lang", StringType), StructField("source", StringType)))),
        hashes = cat.create(N("hashes"), StructType(Seq(StructField("h", StringType)))),
        bands = cat.create(N("bands"), StructType(Seq(
          StructField("doc_id", LongType), StructField("band", IntegerType),
          StructField("band_key", StringType)))),
        verdicts = cat.create(N("verdicts"), StructType(Seq(
          StructField("batch_id", LongType), StructField("doc_id", LongType),
          StructField("admit", BooleanType), StructField("drop_reason", StringType)))))
    }
  }

  /** Streaming incremental admission: dd12's exact + MinHash-LSH
    * admission gate run per micro-batch against the PERSISTED corpus
    * state — the continuous form of the daily-ingest shape. Per batch:
    *  1. exact tier — reject docs whose dd1 content hash is already in
    *     the state, or duplicates a lower-doc_id batch sibling;
    *  2. near tier — reject docs sharing >= 2 LSH band buckets (dd8's
    *     edge threshold) with any admitted corpus doc or any lower-
    *     doc_id batch sibling;
    *  3. admit the survivors: their rows land in `corpus`, their hash
    *     and band keys extend the probe state, and every batch doc gets
    *     a verdict row with its first failing reason.
    * Replay safety: the checkpointed batch id plus a guard on already-
    * verdicted batch ids makes a fully-processed batch's replay a no-op,
    * and the four state inserts are staged in ONE CatalogTxn whose
    * multi-table commit is all-or-nothing (durable commit record;
    * recoverPendingCommits rolls a mid-commit crash forward) — a crash
    * anywhere in the batch either applies the whole admission round or
    * none of it, so replay never re-evaluates a batch against its own
    * half-applied documents.
    */
  def incrementalAdmission(docs: DataFrame, state: AdmissionState,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, state)
        ()
      }
      .start()

  /** One admission round — factored out of the stream for direct reuse
    * by a scheduled batch ingest (the dd12 deployment shape).
    */
  def admitBatch(batch: DataFrame, batchId: Long, state: AdmissionState): Unit = {
    import graft.operators.Dedup
    // idempotence: a restarted query can replay the last batch id
    if (!state.verdicts.df.filter(col("batch_id") === batchId).isEmpty) return
    // the SHARED dd1 canonical hash (Dedup.canonicalHash — one
    // definition; an inline copy here silently split exact-duplicate
    // groups between the batch and streaming ingest paths the moment
    // the canonical formula changed). NULL-safe by that definition, so
    // a NULL-text doc hashes like empty text and keeps its verdict row
    // instead of vanishing through the NULL-keyed joins below.
    val b = batch.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .withColumn("h", Dedup.canonicalHash)
      .cache()
    try {
      val firstInBatch = b.groupBy(col("h")).agg(min(col("doc_id")).as("first_id"))
      val corpusH = state.hashes.df.distinct().withColumn("in_corpus", lit(true))
      val bandsB = Dedup.bandedKeysOf(b).cache()
      try {
        // near tier vs corpus: batch bands probe the state bands — the
        // join is keyed on (band, band_key), bucket-local at any scale.
        // The >=2-band threshold is PER CORPUS DOCUMENT (dd12's pair
        // semantics): the corpus doc_id must survive into the count, or
        // one shared band with doc X plus one with doc Y would reject a
        // document the batch gate admits.
        val nearCorpus = bandsB
          .join(state.bands.df
            .select(col("doc_id").as("corpus_id"), col("band"), col("band_key")),
            Seq("band", "band_key"))
          .groupBy(col("doc_id"), col("corpus_id"))
          .agg(countDistinct(col("band")).as("nb"))
          .filter(col("nb") >= 2)
          .select(col("doc_id")).distinct().withColumn("near_corpus", lit(true))
        // near tier within the batch: later doc rejected against earlier
        val nearBatch = bandsB.select(col("doc_id").as("p"), col("band"), col("band_key"))
          .join(bandsB.select(col("doc_id").as("q"), col("band"), col("band_key")),
            Seq("band", "band_key"))
          .filter(col("p") > col("q"))
          .groupBy(col("p"), col("q")).agg(countDistinct(col("band")).as("nb"))
          .filter(col("nb") >= 2)
          .select(col("p").as("doc_id")).distinct().withColumn("near_batch", lit(true))
        val verdicts = b
          .join(corpusH, Seq("h"), "left")
          .join(firstInBatch, Seq("h"))
          .join(nearCorpus, Seq("doc_id"), "left")
          .join(nearBatch, Seq("doc_id"), "left")
          .select(col("doc_id"), col("text"), col("lang"), col("source"), col("h"),
            coalesce(col("in_corpus"), lit(false)).as("exact_corpus"),
            (col("doc_id") > col("first_id")).as("exact_batch"),
            coalesce(col("near_corpus"), lit(false)).as("near_corpus"),
            coalesce(col("near_batch"), lit(false)).as("near_batch"))
          .withColumn("admit", !col("exact_corpus") && !col("exact_batch") &&
            !col("near_corpus") && !col("near_batch"))
          .withColumn("drop_reason",
            when(col("exact_corpus"), "exact_vs_corpus")
              .when(col("exact_batch"), "exact_in_batch")
              .when(col("near_corpus"), "near_vs_corpus")
              .when(col("near_batch"), "near_in_batch")
              .otherwise(lit(null)))
          .cache()
        try {
          // all four state writes in ONE transaction: the multi-table
          // commit record makes the batch all-or-nothing under crashes
          val N = AdmissionState.N
          val txn = state.catalog.beginTxn()
          try {
            val admitted = verdicts.filter(col("admit"))
            if (!admitted.isEmpty) {
              state.catalog.insertBatch(N("corpus"), admitted.select(col("doc_id"),
                col("text"), col("lang"), col("source")), txn = Some(txn))
              state.catalog.insertBatch(N("hashes"),
                admitted.select(col("h")).distinct(), txn = Some(txn))
              state.catalog.insertBatch(N("bands"), bandsB.join(
                admitted.select(col("doc_id")), "doc_id"), txn = Some(txn))
            }
            state.catalog.insertBatch(N("verdicts"),
              verdicts.select(lit(batchId).as("batch_id"),
                col("doc_id"), col("admit"), col("drop_reason")), txn = Some(txn))
            state.catalog.commitTxn(txn)
          } catch {
            case e: Throwable => state.catalog.rollbackTxn(txn); throw e
          }
        } finally verdicts.unpersist()
      } finally bandsB.unpersist()
    } finally b.unpersist()
  }

  /** Watermarked stream-stream interval join: each purchase paired with
    * EVERY click by the same user within its 30-minute lookback — the
    * CANDIDATE stream a last-touch reducer consumes. This is
    * deliberately NOT the batch ev19 reduction: picking "the latest
    * click per purchase" inside the stream needs either post-join
    * stateful dedup or an aggregation Structured Streaming restricts
    * after a stream-stream join; the contract here is the bounded-state
    * interval join itself, and a consumer (or the batch ev19 query over
    * the sink) reduces pairs to last-touch — summing purchase_value over
    * RAW pairs would multi-count a purchase with several clicks. Both
    * sides carry watermarks and the join predicate bounds the event-time
    * range in BOTH directions, so Spark derives finite state-retention
    * for each side (per the Structured Streaming stream-stream join
    * contract) and evicts click state 30 minutes + watermark past its
    * event time. The join is key-partitioned on user_id —
    * partition-parallel at any rate.
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame =
    attributionJoin(clicks, purchases, "inner")

  /** The outer face of [[clickAttribution]]: purchases with NO click in
    * their 30-minute lookback still emit — with null click columns —
    * once the click-side watermark passes their window (the organic /
    * direct-traffic share every attribution report needs). Same state
    * bounds as the inner join; the null rows surface only when the
    * engine can PROVE no matching click can still arrive, which is the
    * Structured Streaming outer-join contract this operator exists to
    * exercise.
    */
  def clickAttributionOuter(clicks: DataFrame, purchases: DataFrame): DataFrame =
    attributionJoin(clicks, purchases, "left_outer")

  /** The ev19-CONSISTENT reduction of [[clickAttributionOuter]]'s
    * candidate pairs (VERDICT r17 #7: the candidate stream and the
    * reduced stream must be separate, named surfaces so a consumer
    * cannot sum purchase_value over raw pairs and multi-count): each
    * purchase reduces to its LATEST in-lookback click — ties on
    * click_ts break to the highest click_id, unattributed purchases
    * emit a null click id and gap_us = -1, exactly the batch ev19
    * contract. The reducer is an event-time-windowed max_by aggregation
    * DOWNSTREAM of the stream-stream join — one of Structured
    * Streaming's supported chained-stateful shapes in append mode — so
    * rows emit once the watermark passes the purchase's window; state
    * stays bounded by the same watermark that bounds the join. Exactly
    * ONE output row per purchase.
    */
  def lastTouchStream(clicks: DataFrame, purchases: DataFrame): DataFrame =
    attributionJoin(clicks, purchases, "left_outer")
      // the join output already carries purchase_ts's 10-minute
      // watermark — redefining it on the same column is disallowed
      // downstream of a stateful operator
      // purchase_ts re-enters as a plain aggregate (constant per
      // purchase): keeping the watermarked column itself as a group key
      // would give the plan two event-time columns, which Structured
      // Streaming rejects
      .groupBy(window(col("purchase_ts"), "30 minutes"),
        col("purchase_id"), col("user_id"), col("purchase_value"))
      // struct ordering is lexicographic: latest click_ts wins, ties
      // break on click_id; max() skips the all-null struct only when a
      // real candidate exists, so unattributed purchases keep nulls
      .agg(max(col("purchase_ts")).as("purchase_ts"),
        max(struct(col("click_ts"), col("click_id"))).as("best"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"),
        col("best.click_id").as("attributed_click_id"),
        coalesce(
          unix_micros(col("purchase_ts")) - unix_micros(col("best.click_ts")),
          lit(-1L)).as("gap_us"))

  private def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      joinType: String): DataFrame = {
    val c = clicks
      .selectExpr("user_id AS c_user", "event_id AS click_id", "ts AS click_ts")
      .withWatermark("click_ts", "10 minutes")
    val p = purchases
      .selectExpr("user_id AS p_user", "event_id AS purchase_id", "ts AS purchase_ts",
        "value AS purchase_value")
      .withWatermark("purchase_ts", "10 minutes")
    p.join(c,
      expr("""p_user = c_user AND
              click_ts <= purchase_ts AND
              click_ts >= purchase_ts - INTERVAL 30 MINUTES"""),
      joinType)
      .select(col("p_user").as("user_id"), col("purchase_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"), col("click_ts"))
  }
}
