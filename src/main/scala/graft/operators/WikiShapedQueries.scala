package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.wiki.{AliasesJob, EntitiesJob, Queries, WikidataSource}
import graft.operators.Skew

/** The wikid library queries exercised at TPC-H shape (so the driver's
  * DuckDB oracle can hash-check them on its own tables), plus smoke paths
  * that run the actual dump sources/pipeline inside the driver harness.
  */
object WikiShapedQueries {

  import CoreQueries.Q

  /** A1+A2+A3 — the alias-priors pipeline on events: alias=event_type,
    * entity=user_id, occurrences counted then window-normalized per alias.
    * This is the exact dataflow of Queries.aliasPriorsFlat (same code
    * path), so the oracle hash-checks the engine's most important query.
    */
  def aliasPriors(s: SparkSession, d: String): DataFrame = {
    val aliases = Tables.events(s, d)
      .groupBy(col("event_type").as("alias"), col("user_id").as("entity_id"))
      .agg(count(lit(1)).as("count"))
    Queries.aliasPriorsFlat(aliases)
      .select(col("alias"), col("entity_id"), col("count"),
        round(col("prior"), 6).as("prior"))
      .orderBy("alias", "entity_id")
  }

  val aliasPriorsSql: String =
    """WITH a AS (SELECT event_type AS alias, user_id AS entity_id,
      |                  count(*) AS count
      |           FROM events GROUP BY 1, 2)
      |SELECT alias, entity_id, count,
      |  round(CAST(count AS DOUBLE) /
      |        greatest(sum(count) OVER (PARTITION BY alias), 1), 6) AS prior
      |FROM a ORDER BY alias, entity_id""".stripMargin

  /** J1/A4 — load_entities rollup shape on customer/orders: per-customer
    * order-key list (sorted: the deliberate determinism fix over the
    * reference's unordered GROUP_CONCAT) + counts. The key list is emitted
    * as a comma-joined STRING, never an array: the driver's pandas compare
    * cannot sort array-typed columns (r1's only hard `err`).
    */
  def loadEntitiesShape(s: SparkSession, d: String): DataFrame = {
    val orderAgg = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sort_array(collect_list(col("o_orderkey"))).as("order_keys"),
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"))
    Tables.customer(s, d)
      .filter(col("c_custkey") < 30)
      .join(orderAgg.withColumnRenamed("o_custkey", "c_custkey"), Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        array_join(coalesce(col("order_keys"), array().cast("array<bigint>")), ",")
          .as("order_keys"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total"), lit(0.0)).as("total"))
      .orderBy("c_custkey")
  }

  val loadEntitiesShapeSql: String =
    """WITH oa AS (SELECT o_custkey,
      |              array_agg(o_orderkey ORDER BY o_orderkey) AS order_keys,
      |              count(*) AS n_orders,
      |              round(sum(o_totalprice), 2) AS total
      |            FROM orders GROUP BY o_custkey)
      |SELECT c_custkey, c_name,
      |  array_to_string(coalesce(order_keys, []), ',') AS order_keys,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(total, 0.0) AS total
      |FROM customer LEFT JOIN oa ON c_custkey = o_custkey
      |WHERE c_custkey < 30 ORDER BY c_custkey""".stripMargin

  /** S1 smoke — the Wikidata JSON-lines source run end-to-end inside the
    * driver harness: a mini dump synthesized from `documents` (one JSON
    * entity per line with trailing commas, like the real dump), written to
    * a temp file, re-read via WikidataSource + EntitiesJob + alias
    * aggregation. Because the dump derives deterministically from
    * `documents`, the whole chain (dump write -> S1 read -> F1-F4 filters
    * -> alias seed -> A1 agg -> A3 priors) is DuckDB-oracle-checkable:
    * each doc becomes one entity with a single declared alias (`source`),
    * so count = 1 and prior = 1 / n_docs(source).
    */
  def pipelineSmoke(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
    val lines = docs.select(concat(to_json(struct(
      lit("item").as("type"),
      concat(lit("Q"), col("doc_id")).as("id"),
      map(lit("P31"), array(struct(
        struct(struct(struct(lit("Q515").as("id")).as("value")).as("datavalue")).as("mainsnak"),
        lit("normal").as("rank")))).as("claims"),
      map(lit("enwiki"),
        struct(concat(lit("Doc "), col("doc_id")).as("title"))).as("sitelinks"),
      map(lit("en"), struct(lit("en").as("language"),
        concat(lit("Doc "), col("doc_id")).as("value"))).as("labels"),
      map(lit("en"), struct(lit("en").as("language"),
        substring(col("text"), 1, 40).as("value"))).as("descriptions"),
      map(lit("en"), array(struct(lit("en").as("language"),
        col("source").as("value")))).as("aliases"))),
      lit(",")).as("value"))
    val tmp = graft.Caches.newTempDir("graft_dump").toString + "/dump"
    lines.coalesce(1).write.mode("overwrite").text(tmp)
    val ents = EntitiesJob.run(WikidataSource.read(s, tmp))
    val aliases = AliasesJob.aggregate(ents.aliases,
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.wiki.Schemas.aliases))
    Queries.aliasPriorsFlat(aliases)
      .select("alias", "entity_id", "count", "prior")
      .orderBy("alias", "entity_id")
  }

  val pipelineSmokeSql: String =
    """SELECT source AS alias, concat('Q', doc_id) AS entity_id,
      |  CAST(1 AS BIGINT) AS count,
      |  CAST(1.0 AS DOUBLE) / count(*) OVER (PARTITION BY source) AS prior
      |FROM documents WHERE doc_id < 500
      |ORDER BY alias, entity_id""".stripMargin

  /** S3-at-scale smoke — the multistream-indexed PARALLEL XML reader run
    * end-to-end inside the driver harness: the first 200 documents become
    * pages of a faithful pages-articles-multistream fixture (header
    * stream with the unclosed `<mediawiki>` root, 4 independent bz2 page
    * streams, footer stream, plus the `offset:page_id:title` index),
    * read back via `WikipediaSource.readMultistream`. Emitting
    * `md5(text)` makes the oracle a BYTE-EQUALITY check of the whole
    * escape → compress → multistream split → parallel decode → StAX
    * parse round trip against DuckDB's view of the original table.
    */
  def multistreamScan(s: SparkSession, d: String): DataFrame = {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
    def esc(x: String): String =
      x.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // fixture construction (not dataflow): 200 tiny rows to the driver
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val dir = graft.Caches.newTempDir("graft_ms_scan")
    val dump = dir.resolve("dump.xml.bz2").toFile
    val out = new java.io.FileOutputStream(dump)
    val indexLines = scala.collection.mutable.ListBuffer.empty[String]
    try {
      var offset = 0L
      def writeStream(content: String): Long = {
        val before = offset
        val z = new BZip2CompressorOutputStream(out)
        z.write(content.getBytes("UTF-8")); z.finish(); out.flush()
        offset = out.getChannel.position()
        before
      }
      writeStream("<mediawiki>\n  <siteinfo><sitename>graft</sitename></siteinfo>\n")
      for (group <- docs.grouped(50)) {
        val xml = group.map { case (id, text) =>
          s"  <page>\n    <title>Doc $id</title>\n    <ns>0</ns>\n    <id>$id</id>\n" +
            s"    <revision>\n      <id>${900000 + id}</id>\n      <text>${esc(text)}</text>\n    </revision>\n  </page>"
        }.mkString("", "\n", "\n")
        val off = writeStream(xml)
        group.foreach { case (id, _) => indexLines += s"$off:$id:Doc $id" }
      }
      writeStream("</mediawiki>\n")
    } finally out.close()
    java.nio.file.Files.write(dir.resolve("index.txt"),
      indexLines.mkString("\n").getBytes("UTF-8"))
    graft.wiki.WikipediaSource
      .readMultistream(s, dump.getPath, dir.resolve("index.txt").toString)
      .select(col("article_id").cast("long").as("doc_id"),
        md5(col("text")).as("h"))
      .orderBy("doc_id")
  }

  val multistreamScanSql: String =
    """SELECT doc_id, md5(text) AS h FROM documents
      |WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  /** §2.7 / SURVEY §7.4 risk #6 — the reference's `--limit` stream-stop
    * ("first N dump lines in FILE order", not Spark's arbitrary-N
    * `limit`): a doc_id-ordered dump is written, `readLimited` takes the
    * first 100 lines in file order, and the ingest runs on those. The
    * oracle states the file-order contract exactly: the entities must be
    * docs 0..99 — an arbitrary-N limit would hash-mismatch.
    */
  def limitedIngest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
    val lines = docs.orderBy("doc_id").select(concat(to_json(struct(
      lit("item").as("type"),
      concat(lit("Q"), col("doc_id")).as("id"),
      map(lit("enwiki"),
        struct(concat(lit("Doc "), col("doc_id")).as("title"))).as("sitelinks"),
      map(lit("en"), struct(lit("en").as("language"),
        substring(col("text"), 1, 40).as("value"))).as("descriptions"))),
      lit(",")).as("value"))
    val tmp = graft.Caches.newTempDir("graft_limited").toString + "/dump"
    // total sort -> coalesce(1): partitions concatenate in range order,
    // so the single output file is in doc_id order
    lines.coalesce(1).write.mode("overwrite").text(tmp)
    val ents = EntitiesJob.run(WikidataSource.readLimited(s, tmp, 100))
    ents.entities.select(col("id"), col("name"), col("description"))
      .orderBy("id")
  }

  val limitedIngestSql: String =
    """SELECT concat('Q', doc_id) AS id, concat('Doc ', doc_id) AS name,
      |  substr(text, 1, 40) AS description
      |FROM documents WHERE doc_id < 100 ORDER BY id""".stripMargin

  /** Salted two-phase aggregation (skew path) — must equal the plain
    * GROUP BY, which is exactly what the oracle asserts.
    */
  def skewSaltedAgg(s: SparkSession, d: String): DataFrame =
    Skew.saltedSum(Tables.events(s, d), "event_type", "value", salts = 16)
      .select(col("event_type"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy("event_type")

  val skewSaltedAggSql: String =
    """SELECT event_type, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Salted large-large equi-join bound into the driver gate: events
    * joined to per-user counts through [[Skew.saltedJoin]] (left salted,
    * right exploded `salts`×) must aggregate to exactly the plain-join
    * result — the salt must never drop, duplicate, or misroute a row.
    * The oracle IS the plain join.
    */
  def skewSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val userCounts = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_user_events"))
    Skew.saltedJoin(ev.select("event_id", "user_id", "event_type"),
        userCounts, "user_id", salts = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("n_user_events").as("sum_user_events"))
      .orderBy("event_type")
  }

  val skewSaltedJoinSql: String =
    """WITH uc AS (
      |  SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id)
      |SELECT event_type, count(*) AS n,
      |  CAST(sum(n_user_events) AS BIGINT) AS sum_user_events
      |FROM events JOIN uc USING (user_id)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  def queries: Map[String, Q] = Map(
    "skew_salted_agg" -> (skewSaltedAgg _),
    "skew_salted_join" -> (skewSaltedJoin _),
    "wiki_alias_priors" -> (aliasPriors _),
    "wiki_load_entities_shape" -> (loadEntitiesShape _),
    "wiki_limited_ingest" -> (limitedIngest _),
    "wiki_multistream_scan" -> (multistreamScan _),
    "wiki_pipeline_smoke" -> (pipelineSmoke _))

  def oracles: Map[String, String] = Map(
    "skew_salted_agg" -> skewSaltedAggSql,
    "skew_salted_join" -> skewSaltedJoinSql,
    "wiki_alias_priors" -> aliasPriorsSql,
    "wiki_load_entities_shape" -> loadEntitiesShapeSql,
    "wiki_limited_ingest" -> limitedIngestSql,
    "wiki_multistream_scan" -> multistreamScanSql,
    "wiki_pipeline_smoke" -> pipelineSmokeSql)
}
