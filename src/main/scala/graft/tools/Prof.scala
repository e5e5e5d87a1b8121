package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Statement-level profiler for the commit-heavy bench rows: replays a
  * query's verbs one by one, printing wall time and the local
  * filesystem's read/write op deltas per statement — the feedback loop
  * for driving per-verb FS-metadata constants down (the r16 regression
  * family). Diagnostic only; not part of the driver contract.
  */
object Prof {

  private def fsOps(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val it = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
      .iterator().asScala
    var r = 0L; var w = 0L
    it.foreach { s =>
      Option(s.getLong("op_list_status")).foreach(r += _)
      Option(s.getLong("op_get_file_status")).foreach(r += _)
      Option(s.getLong("op_exists")).foreach(r += _)
      Option(s.getLong("op_open")).foreach(r += _)
      Option(s.getLong("op_create")).foreach(w += _)
      Option(s.getLong("op_rename")).foreach(w += _)
      Option(s.getLong("op_delete")).foreach(w += _)
    }
    (r, w)
  }

  private var last = (0L, 0L)
  private var lastT = System.nanoTime()
  private def mark(label: String): Unit = {
    val now = fsOps()
    val t = System.nanoTime()
    println(f"[prof] $label%-28s ${(t - lastT) / 1e9}%7.2f s  " +
      f"reads +${now._1 - last._1}%-6d writes +${now._2 - last._2}%-6d")
    last = now
    lastT = t
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val which = args.headOption.getOrElse("q72")
    // warmup rep (uncounted), then the profiled rep
    run(spark, sfDir, which); graft.Caches.releaseAll(spark)
    println("[prof] ---- warm rep done ----")
    last = fsOps(); lastT = System.nanoTime()
    run(spark, sfDir, which)
    spark.stop()
  }

  private def run(spark: SparkSession, sfDir: String, which: String): Unit =
    which match {
      case "q72" => q72(spark, sfDir)
      case "q73" => q73(spark, sfDir)
      case "sfts" => sfts(spark, sfDir)
      case "smerge" => smerge(spark, sfDir)
      case "dinc" => dinc(spark, sfDir)
      case "bm25" => bm25(spark, sfDir)
      case "q86" => q86(spark, sfDir)
      case "q90" => q90(spark, sfDir)
      case "wmicro" => wmicro(spark, sfDir)
      case other => sys.error(s"unknown profile target $other")
    }

  /** Micro-benchmark of small parquet-write shapes (the per-commit
    * fixed-cost hunt): same tiny frame written through the plans the
    * commit verbs use, 5 reps each post-warm.
    */
  private def wmicro(s: SparkSession, d: String): Unit = {
    val ev = graft.Tables.events(s, d)
      .select("event_id", "event_type", "user_id").cache()
    ev.count()
    val base = graft.Caches.newTempDir("graft_prof_wmicro").toString
    var n = 0
    def t(label: String)(body: => Unit): Unit = {
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label%-40s min ${reps.min}%6.3f s  " +
        reps.map(r => f"$r%5.3f").mkString(" "))
    }
    def dir(): String = { n += 1; s"$base/w$n" }
    val small = ev.limit(2000).cache(); small.count()
    mark("setup")
    t("plain write (source partitions)") { ev.write.parquet(dir()) }
    t("plain write small (source partitions)") { small.write.parquet(dir()) }
    t("coalesce(1) small") { small.coalesce(1).write.parquet(dir()) }
    t("repartition(8,etype)+sort small") {
      small.repartition(8, col("event_type"))
        .sortWithinPartitions("event_type").write.parquet(dir()) }
    t("repartition(etype)+partitionBy small") {
      small.repartition(col("event_type"))
        .write.partitionBy("event_type").parquet(dir()) }
    t("coalesce(1)+partitionBy small") {
      small.coalesce(1)
        .write.partitionBy("event_type").parquet(dir()) }
    t("noop small") {
      small.write.format("noop").mode("overwrite").save() }
    mark("shapes")
    ev.unpersist(); small.unpersist()
  }

  /** The q86_incr_view_distinct bench row, statement by statement: src
    * commit, CREATE MV, insert-only append + delta refresh, delete +
    * recompute refresh, then the verification join.
    */
  private def q86(s: SparkSession, d: String): Unit = {
    import graft.catalog.{MaterializedView, VersionedTable}
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(s, d).select("event_id", "event_type", "user_id")
    val dir = graft.Caches.newTempDir("graft_prof_q86").toString
    val src = s"$dir/src"; val view = s"$dir/view"
    mark("setup")
    ev.repartition(4).write.format("graft").mode("errorifexists").save(src)
    mark("src commit v0")
    graft.sql.GraftSql.run(s,
      s"""CREATE MATERIALIZED VIEW graft.`$view` AS
         |SELECT event_type, count(*) AS n,
         |  approx_count_distinct(user_id) AS du
         |FROM graft.`$src` GROUP BY event_type""".stripMargin)
    mark("create mv")
    VersionedTable.append(ev.filter(col("event_id") % 7 === 0)
      .select((col("event_id") + 10000000L).as("event_id"),
        lit("synthetic").as("event_type"),
        (col("user_id") + 500000L).as("user_id")), src)
    mark("append")
    graft.sql.GraftSql.run(s, s"REFRESH MATERIALIZED VIEW graft.`$view`")
    mark("refresh (delta)")
    VersionedTable.deleteWhere(s, src, Some("user_id % 13 = 0"))
    mark("deleteWhere")
    graft.sql.GraftSql.run(s, s"REFRESH MATERIALIZED VIEW graft.`$view`")
    mark("refresh (recompute)")
    val exact = VersionedTable.read(s, src).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    MaterializedView.read(s, view)
      .join(exact, Seq("event_type"))
      .select(col("event_type"), col("n"), col("n_exact"))
      .orderBy("event_type").collect()
    mark("verification join")
  }

  /** The q90_bucketed_dml bench row's fixture verbs: two bucketed table
    * builds, a rewrite MERGE, a DV MERGE, then the co-located join.
    */
  private def q90(s: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    mark("setup")
    graft.operators.CoreQueries.queries("q90_bucketed_dml")(s, d).count()
    mark("whole row (count)")
  }

  /** The dedup_incremental bench row, statement by statement: store
    * build (partitioned signature write) then the O(batch) probe.
    */
  private def dinc(s: SparkSession, d: String): Unit = {
    import graft.ext.Dedup
    val docs = graft.Tables.documents(s, d).select("doc_id", "text")
    val store = graft.Caches.newTempDir("graft_prof_dinc").toString
    mark("setup")
    Dedup.appendSignatureStore(docs, "doc_id", "text", store,
      storeParts = 4)
    mark("store build")
    val batch = docs.filter(col("doc_id") < 50)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    Dedup.dedupAgainstStore(s, store, batch, "doc_id", "text",
      threshold = 0.8, storeParts = 4)
      .filter(col("batch_id") === col("store_id") + 1000000L)
      .count()
    mark("probe")
    Dedup.dedupAgainstStore(s, store, batch, "doc_id", "text",
      threshold = 0.8, storeParts = 4).count()
    mark("probe rep2")
  }

  /** The fts_bm25_store bench row, statement by statement: create,
    * two appends, a tombstone delete, compaction, then the ranked
    * probe.
    */
  private def bm25(s: SparkSession, d: String): Unit = {
    import graft.fts.FtsStore
    val docs = graft.Tables.documents(s, d).select("doc_id", "text")
    val store = graft.Caches.newTempDir("graft_prof_bm25").toString
    mark("setup")
    FtsStore.create(docs.filter(col("doc_id") % 10 < 8), "doc_id",
      Seq("text"), store, numBuckets = 8)
    mark("create")
    FtsStore.append(docs.filter(col("doc_id") % 10 >= 8), "doc_id",
      Seq("text"), store)
    mark("append 1")
    FtsStore.append(
      docs.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" spark refreshed")).as("text")),
      "doc_id", Seq("text"), store)
    mark("append 2")
    FtsStore.delete(docs.filter(col("doc_id") % 97 === 0)
      .select("doc_id"), "doc_id", store)
    mark("delete")
    FtsStore.compact(s, store)
    mark("compact")
    FtsStore.searchBm25(s, store, Seq("spark", "window"))
      .orderBy(col("score").desc, col("doc_id")).limit(50).collect()
    mark("searchBm25")
    FtsStore.searchBm25(s, store, Seq("spark", "window"))
      .orderBy(col("score").desc, col("doc_id")).limit(50).collect()
    mark("searchBm25 rep2")
  }

  private def smerge(s: SparkSession, d: String): Unit = {
    import graft.catalog.VersionedTable
    val docs = graft.Tables.documents(s, d)
      .select("doc_id", "source", "n_chars")
    val t = graft.Caches.newTempDir("graft_prof_smerge_tbl").toString + "/t"
    VersionedTable.commit(docs.repartitionByRange(8, col("doc_id")), t)
    val patch = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("n_chars", col("n_chars") * 3)
      .unionByName(docs.filter(col("doc_id") % 100 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val src = graft.Caches.newTempDir("graft_prof_smerge_src").toString
    patch.repartition(3).write.mode("overwrite").parquet(src)
    val ckpt = graft.Caches.newTempDir("graft_prof_smerge_ckpt").toString
    mark("setup + commit v0")
    graft.streaming.Streams.streamMergeRows(s, src, t, ckpt, "doc_id")
    mark("stream merge (3 batches)")
    graft.streaming.Streams.streamMergeRows(s, src, t, ckpt, "doc_id")
    mark("checkpointed rerun")
    VersionedTable.read(s, t).groupBy("source")
      .agg(count(lit(1)).as("n")).collect()
    mark("final agg")
  }

  private def sfts(s: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(s, d).select("doc_id", "text")
    val src = graft.Caches.newTempDir("graft_prof_sfts_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(src)
    val store = graft.Caches.newTempDir("graft_prof_sfts_store")
      .toString + "/store"
    val ckpt = graft.Caches.newTempDir("graft_prof_sfts_ckpt").toString
    mark("setup")
    graft.streaming.Streams.streamFtsIngest(s, src, store, ckpt)
    mark("stream ingest (3 batches)")
    graft.fts.FtsStore.searchAll(s, store, Seq("spark", "window"))
      .select(col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50).collect()
    mark("searchAll")
  }

  private def q72(s: SparkSession, d: String): Unit = {
    import graft.catalog.{GraftScan, VersionedTable}
    import graft.sql.GraftSql
    val t = graft.Caches.newTempDir("graft_prof_q72").toString + "/t"
    graft.Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), (col("doc_id") % 4).as("bucket"),
        col("n_chars"))
      .createOrReplaceTempView("q72_docs")
    s.sql("DROP TABLE IF EXISTS q72_t")
    mark("setup")
    GraftSql.run(s,
      s"""CREATE TABLE q72_t USING graft OPTIONS (path '$t')
         |PARTITIONED BY (lang, bucket)
         |AS SELECT * FROM q72_docs""".stripMargin)
    mark("ctas")
    VersionedTable.layoutPartitionCols(s, t)
    mark("layout probe")
    GraftSql.run(s,
      s"UPDATE graft.`$t` SET n_chars = n_chars + 1000 WHERE bucket = 2")
    mark("update")
    GraftSql.run(s, s"DELETE FROM graft.`$t` WHERE doc_id % 10 = 9")
    mark("delete")
    VersionedTable.read(s, t).inputFiles
    mark("read.inputFiles")
    val (df, idx) = GraftScan.readWithIndex(s, t)
    mark("readWithIndex plan")
    val lang0 = df.select("lang").orderBy("lang").head().getString(0)
    mark("lang0 head")
    df.filter(col("lang") === lang0 && col("bucket") === 2)
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("chars"))
      .withColumn("lang", lit(lang0))
      .select("lang", "n", "chars").head()
    mark("final agg")
    idx.inputFiles
    s.sql("DROP TABLE IF EXISTS q72_t")
    mark("teardown")
  }

  private def q73(s: SparkSession, d: String): Unit = {
    import graft.catalog.VersionedTable
    import graft.sql.GraftSql
    val docs = graft.Tables.documents(s, d)
      .select("doc_id", "source", "n_chars")
    val t = graft.Caches.newTempDir("graft_prof_q73").toString + "/t"
    mark("setup")
    VersionedTable.commit(docs, t, Seq("source"))
    mark("commit v0")
    GraftSql.run(s,
      s"""INSERT OVERWRITE graft.`$t` PARTITION (source='src3')
         |SELECT doc_id, CAST(n_chars div 2 AS BIGINT)
         |FROM graft.`$t` WHERE source = 'src3'""".stripMargin)
    mark("insert overwrite")
    VersionedTable.read(s, t)
      .filter(col("n_chars") >= 400)
      .withColumn("n_chars", lit(400L))
      .select("doc_id", "source", "n_chars")
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "n_chars >= 400").save(t)
    mark("replaceWhere")
    GraftSql.run(s,
      s"""SELECT source, count(*) AS n,
         |  CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM graft.`$t` GROUP BY source ORDER BY source""".stripMargin)
      .collect()
    mark("final agg")
  }
}
