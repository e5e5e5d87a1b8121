package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streams

/** Driver-harness entries for the streaming surface. The windowed
  * streaming aggregation drains with AvailableNow, so its final result
  * equals the batch query — which makes it DuckDB-oracle-checkable: the
  * hash compare proves streaming/batch consistency.
  */
object StreamingQueries {

  import CoreQueries.Q

  private val runId = new AtomicInteger(0)

  def streamingWindow(s: SparkSession, d: String): DataFrame =
    Streams.windowedEventCounts(s, s"$d/events.parquet",
      queryName = s"graft_stream_out_${runId.incrementAndGet()}")
      .orderBy("day", "event_type")

  val streamingWindowSql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  def sessionizeBatch(s: SparkSession, d: String): DataFrame =
    Streams.sessionizeBatch(Tables.events(s, d), gapMs = 3600000L)

  val sessionizeBatchSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN prev_ts IS NULL
      |           OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000 THEN 1 ELSE 0 END AS new_session
      |  FROM (SELECT user_id, ts, value,
      |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |        FROM events)),
      |si AS (
      |  SELECT user_id, value,
      |    -- the cumsum window MUST be ordered: without ORDER BY the frame
      |    -- runs in arbitrary (parallel-scan) row order and session
      |    -- assignment becomes nondeterministic at scale
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM g)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM si GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** Streaming exactly-once dedup over a source with planted duplicate
    * files — correct output equals the batch aggregate over the original
    * events, which the oracle states directly. Routed through the
    * PRODUCTION path (Append-mode parquet file sink + checkpoint, batch
    * aggregate over the sink), not the Complete/memory test adapter.
    */
  def streamingDedup(s: SparkSession, d: String): DataFrame =
    Streams.dedupedEventCountsAppend(s, s"$d/events.parquet")
      .orderBy("event_type")

  val streamingDedupSql: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Watermarked stream-stream interval join drained with AvailableNow —
    * the final table equals the batch interval join the oracle states.
    */
  def streamingJoin(s: SparkSession, d: String): DataFrame =
    Streams.streamStreamIntervalJoin(s, s"$d/events.parquet",
      queryName = s"graft_stream_join_${runId.incrementAndGet()}")
      .orderBy("purchase_id", "signup_id")

  val streamingJoinSql: String =
    """SELECT p.event_id AS purchase_id, p.user_id, s.event_id AS signup_id
      |FROM events p JOIN events s
      |  ON p.user_id = s.user_id
      | AND p.event_type = 'purchase' AND s.event_type = 'signup'
      | AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 7 DAY
      |ORDER BY purchase_id, signup_id""".stripMargin

  /** Left-outer stream-stream interval join: matched purchases emit as
    * they form; unmatched ones emit a null signup once the signup-side
    * watermark guarantees no match can arrive. The purchase side is cut
    * off strictly below the final global watermark, at
    * min(max purchase ts, max signup ts) − watermark − 1 min — 61 minutes
    * at the default 1-hour delay (see Streams.streamStreamLeftJoin) — so
    * every outer row is guaranteed flushed before the drain ends — which
    * is exactly the condition the batch LEFT JOIN oracle restates.
    */
  def streamingLeftJoin(s: SparkSession, d: String): DataFrame =
    Streams.streamStreamLeftJoin(s, s"$d/events.parquet",
      queryName = s"graft_stream_ljoin_${runId.incrementAndGet()}")
      .orderBy("purchase_id", "signup_id")

  val streamingLeftJoinSql: String =
    """WITH cutoff AS (
      |  SELECT least(
      |    (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
      |    (SELECT max(ts) FROM events WHERE event_type = 'signup'))
      |    - INTERVAL 61 MINUTE AS c)
      |SELECT p.event_id AS purchase_id, p.user_id, s.event_id AS signup_id
      |FROM events p
      |LEFT JOIN events s
      |  ON p.user_id = s.user_id
      | AND s.event_type = 'signup'
      | AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 7 DAY
      |WHERE p.event_type = 'purchase' AND p.ts <= (SELECT c FROM cutoff)
      |ORDER BY purchase_id, signup_id""".stripMargin

  /** Stream-static broadcast enrichment (the title-map pattern on a live
    * stream): a deterministic user→tier dim derived from user_id, so the
    * oracle can restate the whole enrichment in SQL.
    */
  def streamingEnrich(s: SparkSession, d: String): DataFrame = {
    // % (not pmod): the oracle uses DuckDB's %, which diverges from
    // pmod on negative ids
    val dim = Tables.events(s, d).select("user_id").distinct()
      .withColumn("tier", concat(lit("t"), col("user_id") % 3))
    Streams.streamStaticEnrich(s, s"$d/events.parquet", dim, "user_id",
      queryName = s"graft_stream_enrich_${runId.incrementAndGet()}")
      .orderBy("tier", "event_type")
  }

  val streamingEnrichSql: String =
    """SELECT concat('t', user_id % 3) AS tier, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY tier, event_type""".stripMargin

  /** Streaming FTS ingest: the documents corpus planted as a 3-file
    * source, drained AvailableNow at one file per micro-batch, each batch
    * appended as one immutable [[graft.fts.FtsStore]] segment through the
    * PRODUCTION path (foreachBatch + checkpoint + store lock). After the
    * drain, the store's tf-idf AND-ranking must equal a fresh
    * whole-corpus index — the oracle (shared with fts_rank) states that
    * directly, so segment composition is proven invisible to scoring.
    */
  def streamingFts(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val src = graft.Caches.newTempDir("graft_stream_fts_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(src)
    val store = graft.Caches.newTempDir("graft_stream_fts_store").toString + "/store"
    val ckpt = graft.Caches.newTempDir("graft_stream_fts_ckpt").toString
    Streams.streamFtsIngest(s, src, store, ckpt)
    graft.fts.FtsStore.searchAll(s, store, Seq("spark", "window"))
      .select(col("doc_id"), col("n_terms"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)
  }

  val streamingFtsSql: String = ExtQueries.ftsRankSql

  /** Streaming sketch-cube ingest under the hash gate: the events table
    * planted as a 3-file source, each micro-batch reduced to per-key HLL
    * sketches and committed to a versioned cube; after the drain the
    * cube's distinct estimate per event_type must sit within tolerance
    * of the exact count (the q37 gate — oracle pins exact + within_tol).
    */
  def streamingSketchCube(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("event_type", "user_id", "event_id")
    val src = graft.Caches.newTempDir("graft_stream_cube_src").toString
    ev.repartition(3).write.mode("overwrite").parquet(src)
    val cube = graft.Caches.newTempDir("graft_stream_cube").toString + "/cube"
    val ckpt = graft.Caches.newTempDir("graft_stream_cube_ckpt").toString
    Streams.streamSketchCube(s, src, cube, ckpt, Seq("event_type"), "user_id")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    graft.ext.SketchCube.distinct(s, cube, Seq("event_type"))
      .join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          greatest(ceil(col("n_exact") * 0.10), lit(1L)))
          .cast("int").as("within_tol"))
      .orderBy("event_type")
  }

  val streamingSketchCubeSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_exact, 1 AS within_tol
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CDC follower under the hash gate: commit documents, poll (full
    * snapshot), upsert the min source doubled, poll again (exactly the
    * patch, by manifest diff), poll a third time (nothing — the cursor
    * advanced and no new version exists, so the processor must not
    * fire). Both delivered windows aggregate into one result the oracle
    * restates closed-form.
    */
  def streamingTableFollow(s: SparkSession, d: String): DataFrame = {
    import graft.catalog.VersionedTable
    val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
    val t = graft.Caches.newTempDir("graft_follow_tbl").toString + "/t"
    val cursor = graft.Caches.newTempDir("graft_follow_cur").toString
    VersionedTable.commit(docs, t, Seq("source"))
    val polls = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def poll(tag: Int): Int =
      Streams.followTableChanges(s, t, cursor) { (window, _) =>
        polls += window.withColumn("poll", lit(tag))
      }
    require(poll(1) == 1, "first poll must consume the initial commit")
    val minSrc = docs.agg(min("source")).head().getString(0)
    VersionedTable.upsertPartitions(
      docs.filter(col("source") === minSrc)
        .withColumn("n_chars", col("n_chars") * 2),
      t, "source")
    require(poll(2) == 1, "second poll must consume the upsert")
    require(poll(3) == 0, "an idle poll must consume nothing")
    polls.reduce(_ unionByName _)
      .groupBy("poll", "source")
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("chars"))
      .orderBy("poll", "source")
  }

  val streamingTableFollowSql: String =
    """WITH m AS (SELECT min(source) AS ms FROM documents)
      |SELECT 1 AS poll, source, count(*) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM documents GROUP BY source
      |UNION ALL
      |SELECT 2, source, count(*), CAST(sum(n_chars * 2) AS BIGINT)
      |FROM documents WHERE source = (SELECT ms FROM m) GROUP BY source
      |ORDER BY poll, source""".stripMargin

  /** Streaming CDC-merge under the hash gate: a patch stream (updates
    * tripling every 10th doc's n_chars + inserts re-keyed +1M) drains
    * in micro-batches, each an atomic row-level merge commit; the final
    * table must equal the closed-form merged corpus, and a checkpointed
    * rerun must replay nothing (version ladder unchanged).
    *
    * BENCH-ROW CONSTANT (r19): the streaming_* merge rows are
    * micro-batch-loop dominated (many short commit pipelines), the same
    * host-jitter class as ann_ivfpq. Same-host A/B on the r19 bench
    * day: REBUILT r18 HEAD read streaming_merge 3.71 s /
    * streaming_merge_when 3.67 s in a 0.78-canary window — ~25% above
    * its own-day 2.89/2.97 artifact on byte-identical code — while the
    * r19 round-final artifact reads 3.44/3.31. Day-level host drift;
    * no code regression (r19 reads FASTER than r18-code-today).
    */
  def streamingMerge(s: SparkSession, d: String): DataFrame = {
    import graft.catalog.VersionedTable
    val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
    val t = graft.Caches.newTempDir("graft_smerge_tbl").toString + "/t"
    VersionedTable.commit(docs.repartitionByRange(8, col("doc_id")), t)
    val patch = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("n_chars", col("n_chars") * 3)
      .unionByName(docs.filter(col("doc_id") % 100 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val src = graft.Caches.newTempDir("graft_smerge_src").toString
    patch.repartition(3).write.mode("overwrite").parquet(src)
    val ckpt = graft.Caches.newTempDir("graft_smerge_ckpt").toString
    Streams.streamMergeRows(s, src, t, ckpt, "doc_id")
    val nVersions = VersionedTable.versions(s, t).size
    Streams.streamMergeRows(s, src, t, ckpt, "doc_id")
    require(VersionedTable.versions(s, t).size == nVersions,
      "checkpointed rerun must replay nothing")
    VersionedTable.read(s, t)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("n_chars").cast("long").as("chars"),
        sum(when(col("doc_id") >= 1000000L, 1).otherwise(0)).cast("long")
          .as("n_inserted"))
      .orderBy("source")
  }

  val streamingMergeSql: String =
    """WITH merged AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 10 = 0 THEN n_chars * 3 ELSE n_chars END
      |      AS n_chars
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, source, n_chars FROM documents
      |  WHERE doc_id % 100 = 0)
      |SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
      |  CAST(sum(CASE WHEN doc_id >= 1000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_inserted
      |FROM merged GROUP BY source ORDER BY source""".stripMargin

  /** Streaming CONDITIONAL merge under the hash gate: the q51 clause
    * set (WHEN MATCHED AND t.n_chars < 150 DELETE; WHEN MATCHED AND
    * s.n_chars > t.n_chars UPDATE n_chars only; NOT MATCHED INSERT)
    * applied per micro-batch by [[Streams.streamMergeWhen]]; the final
    * table must equal the same closed form, and a checkpointed rerun
    * must replay nothing. The clauses here are replay-idempotent by
    * construction (constant source value + monotonic guard), which is
    * the operator's documented contract for at-least-once safety.
    */
  def streamingMergeWhen(s: SparkSession, d: String): DataFrame = {
    import graft.catalog.VersionedTable
    val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
    val t = graft.Caches.newTempDir("graft_smw_tbl").toString + "/t"
    VersionedTable.commit(docs.repartitionByRange(8, col("doc_id")), t)
    val patch = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("n_chars", lit(400L))
      .unionByName(docs.filter(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + 2000000L)
        .withColumn("n_chars", lit(400L)))
    val src = graft.Caches.newTempDir("graft_smw_src").toString
    patch.repartition(3).write.mode("overwrite").parquet(src)
    val ckpt = graft.Caches.newTempDir("graft_smw_ckpt").toString
    // deleteWhen + insert is refused by default (crash replay would
    // resurrect deleted keys); this harness run drains a finite source
    // under an exactly-once checkpoint — the rerun below PROVES no
    // replay happens — so the opt-out is sound here and exercises the
    // escape hatch itself
    def run(): Unit = Streams.streamMergeWhen(s, src, t, ckpt, "doc_id",
      updateWhen = Some("s.n_chars > t.n_chars"),
      updateCols = Some(Seq("n_chars")),
      deleteWhen = Some("t.n_chars < 150"),
      allowNonIdempotentReplay = true)
    run()
    val nVersions = VersionedTable.versions(s, t).size
    run()
    require(VersionedTable.versions(s, t).size == nVersions,
      "checkpointed rerun must replay nothing")
    VersionedTable.read(s, t)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum("n_chars").cast("long").as("chars"),
        sum(when(col("doc_id") >= 2000000L, 1).otherwise(0)).cast("long")
          .as("n_inserted"))
      .orderBy("source")
  }

  val streamingMergeWhenSql: String =
    """WITH merged AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 7 = 0 AND n_chars < 400 THEN 400
      |         ELSE n_chars END AS n_chars
      |  FROM documents
      |  WHERE NOT (doc_id % 7 = 0 AND n_chars < 150)
      |  UNION ALL
      |  SELECT doc_id + 2000000, source, 400 FROM documents
      |  WHERE doc_id % 50 = 0)
      |SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars,
      |  CAST(sum(CASE WHEN doc_id >= 2000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_inserted
      |FROM merged GROUP BY source ORDER BY source""".stripMargin

  /** Streaming expectations (dead-letter) under the hash gate: a feed
    * where every 10th doc is corrupted (negative n_chars) drains
    * through [[Streams.streamAppendExpect]] against a table carrying
    * the `n_chars >= 0` CHECK — clean rows land in the table,
    * corrupted rows in the quarantine tagged with the failed
    * constraint, a checkpointed rerun replays nothing, and even a
    * FRESH-checkpoint rerun (same appId, replayed batchIds) is skipped
    * by the txn idempotence guard on BOTH tables.
    */
  def streamingExpectations(s: SparkSession, d: String): DataFrame = {
    import graft.catalog.VersionedTable
    val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
    val t = graft.Caches.newTempDir("graft_sexp_tbl").toString + "/t"
    val qr = graft.Caches.newTempDir("graft_sexp_quar").toString + "/q"
    VersionedTable.commit(docs.limit(0), t)
    VersionedTable.setConstraint(s, t, "n_chars_nonneg", "n_chars >= 0")
    val feed = docs.withColumn("n_chars",
      when(col("doc_id") % 10 === 0, -col("n_chars") - 1)
        .otherwise(col("n_chars")))
    val src = graft.Caches.newTempDir("graft_sexp_src").toString
    feed.repartition(3).write.mode("overwrite").parquet(src)
    val ckpt = graft.Caches.newTempDir("graft_sexp_ckpt").toString
    def run(ck: String): Unit =
      Streams.streamAppendExpect(s, src, t, qr, ck, "expect-demo")
    run(ckpt)
    val nT = VersionedTable.versions(s, t).size
    val nQ = VersionedTable.versions(s, qr).size
    run(ckpt)
    require(VersionedTable.versions(s, t).size == nT &&
      VersionedTable.versions(s, qr).size == nQ,
      "checkpointed rerun must replay nothing")
    run(graft.Caches.newTempDir("graft_sexp_ckpt2").toString)
    require(VersionedTable.versions(s, t).size == nT &&
      VersionedTable.versions(s, qr).size == nQ,
      "fresh-checkpoint replay must be skipped by the txn guard")
    val quar = VersionedTable.read(s, qr)
    require(quar.where(array_contains(col("_violated"), "n_chars_nonneg"))
      .count() == quar.count(), "every quarantined row carries its reason")
    val tAgg = VersionedTable.read(s, t).groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("chars"))
      .withColumn("side", lit("clean"))
    val qAgg = quar.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("chars"))
      .withColumn("side", lit("quarantine"))
    tAgg.unionByName(qAgg).select("side", "source", "n", "chars")
      .orderBy("side", "source")
  }

  val streamingExpectationsSql: String =
    """WITH feed AS (SELECT doc_id, source,
      |    CASE WHEN doc_id % 10 = 0 THEN -n_chars - 1 ELSE n_chars END
      |      AS n_chars
      |  FROM documents)
      |SELECT 'clean' AS side, source, count(*) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM feed WHERE n_chars >= 0 GROUP BY source
      |UNION ALL
      |SELECT 'quarantine', source, count(*), CAST(sum(n_chars) AS BIGINT)
      |FROM feed WHERE n_chars < 0 GROUP BY source
      |ORDER BY side, source""".stripMargin

  /** Streaming PARTITION BACKFILL under the hash gate: two recomputed
    * one-partition slice files stream through
    * [[Streams.streamBackfillPartitions]] — each micro-batch
    * atomically REPLACES exactly its own partition of a versioned
    * table (replaceWhere per batch), every other partition asserted
    * in-query to carry forward BY FILE REFERENCE, and a checkpointed
    * rerun must land nothing. The late-data reprocessing idiom
    * (recompute day X, swap it in) as a stream.
    */
  def streamingBackfill(s: SparkSession, d: String): DataFrame = {
    import graft.catalog.VersionedTable
    val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
    val t = graft.Caches.newTempDir("graft_sbfq_tbl").toString + "/t"
    VersionedTable.commit(docs, t, Seq("source"))
    val targets = docs.select("source").distinct().orderBy("source")
      .limit(2).collect().map(_.getString(0)).toSeq
    val src = graft.Caches.newTempDir("graft_sbfq_src").toString
    // one slice file per replaced partition — batches touch DISJOINT
    // partitions, so delivery order cannot change the final state
    targets.foreach { sv =>
      docs.filter(col("source") === sv)
        .withColumn("n_chars", col("n_chars") * 2)
        .coalesce(1).write.mode("append").parquet(src)
    }
    val preOther = VersionedTable.read(s, t).inputFiles
      .filterNot(f => targets.exists(sv => f.contains(s"/source=$sv/")))
      .toSet
    val ckpt = graft.Caches.newTempDir("graft_sbfq_ckpt").toString
    Streams.streamBackfillPartitions(s, src, t, ckpt, "source")
    require(preOther.subsetOf(VersionedTable.read(s, t).inputFiles.toSet),
      "untouched partitions must carry forward by file reference")
    val nV = VersionedTable.versions(s, t).size
    Streams.streamBackfillPartitions(s, src, t, ckpt, "source")
    require(VersionedTable.versions(s, t).size == nV,
      "checkpointed rerun must land nothing")
    VersionedTable.read(s, t)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("chars"))
      .orderBy("source")
  }

  val streamingBackfillSql: String =
    """WITH keys AS (
      |  SELECT DISTINCT source FROM documents ORDER BY source LIMIT 2),
      |cur AS (
      |  SELECT doc_id, source,
      |    CASE WHEN source IN (SELECT source FROM keys)
      |         THEN n_chars * 2 ELSE n_chars END AS n_chars
      |  FROM documents)
      |SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
      |FROM cur GROUP BY source ORDER BY source""".stripMargin

  def queries: Map[String, Q] = Map(
    "streaming_backfill" -> (streamingBackfill _),
    "streaming_table_follow" -> (streamingTableFollow _),
    "streaming_expectations" -> (streamingExpectations _),
    "streaming_merge" -> (streamingMerge _),
    "streaming_merge_when" -> (streamingMergeWhen _),
    "streaming_window" -> (streamingWindow _),
    "streaming_dedup" -> (streamingDedup _),
    "streaming_join" -> (streamingJoin _),
    "streaming_left_join" -> (streamingLeftJoin _),
    "streaming_enrich" -> (streamingEnrich _),
    "streaming_fts" -> (streamingFts _),
    "streaming_sketch_cube" -> (streamingSketchCube _),
    "streaming_sessionize_batch" -> (sessionizeBatch _))

  def oracles: Map[String, String] = Map(
    "streaming_backfill" -> streamingBackfillSql,
    "streaming_table_follow" -> streamingTableFollowSql,
    "streaming_expectations" -> streamingExpectationsSql,
    "streaming_merge" -> streamingMergeSql,
    "streaming_merge_when" -> streamingMergeWhenSql,
    "streaming_window" -> streamingWindowSql,
    "streaming_dedup" -> streamingDedupSql,
    "streaming_join" -> streamingJoinSql,
    "streaming_left_join" -> streamingLeftJoinSql,
    "streaming_enrich" -> streamingEnrichSql,
    "streaming_fts" -> streamingFtsSql,
    "streaming_sketch_cube" -> streamingSketchCubeSql,
    "streaming_sessionize_batch" -> sessionizeBatchSql)
}
