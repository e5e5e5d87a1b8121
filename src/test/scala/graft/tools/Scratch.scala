package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness — Test scope only, never in the
  * published artifact (the SigDebug lesson).
  * `runMain graft.Scratch etl` profiles the Wikidata-ingest stages;
  * no arg (or `wp`) profiles the Wikipedia prior-pass stages.
  */
object Scratch {

  private def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def etlProfile(spark: SparkSession): Unit = {
    import graft.wiki.{AliasesJob, EntitiesJob, Schemas, WikidataSource}
    val tmpPath = Caches.newTempDir("graft_scratch_etl")
    val tmp = tmpPath.toString
    val dump = s"$tmp/dump"
    val nLines = 1000000L
    Bench.etlDumpLines(spark, nLines).repartition(64)
      .write.mode("overwrite").option("compression", "bzip2").text(dump)
    for (round <- 1 to 2) {
      t(s"[$round] raw text scan sum(length)") {
        spark.read.text(dump).select(sum(length(col("value")))).collect()
      }
      t(s"[$round] from_json parse + count") {
        WikidataSource.read(spark, dump).count()
      }
      t(s"[$round] from_json parse + count ids (narrow)") {
        WikidataSource.read(spark, dump)
          .select(sum(length(col("id")))).collect()
      }
      t(s"[$round] entities only (no singleScan), write") {
        val r = EntitiesJob.run(WikidataSource.read(spark, dump))
        r.entities.write.mode("overwrite").parquet(s"$tmp/e1")
      }
      t(s"[$round] full ETL singleScan: 3 writes") {
        val ents = EntitiesJob.run(WikidataSource.read(spark, dump), singleScan = true)
        ents.entities.write.mode("overwrite").parquet(s"$tmp/entities")
        ents.properties.write.mode("overwrite").parquet(s"$tmp/properties")
        val emptyLinks = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.aliases)
        AliasesJob.aggregate(ents.aliases, emptyLinks)
          .write.mode("overwrite").parquet(s"$tmp/aliases")
        ents.release()
      }
    }
    Caches.deleteNow(tmpPath)
  }

  /** Print formatted physical plans for the named driver queries. */
  def plans(spark: SparkSession, names: Seq[String], sfDir: String): Unit =
    for (n <- names) {
      System.err.println(s"\n========== $n ==========")
      try System.err.println(
        SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => System.err.println(s"failed: $e") }
      Caches.releaseAll(spark)
    }

  /** Stage-by-stage timing of the curation_pipeline row. */
  def pipeProfile(spark: SparkSession, d: String): Unit = {
    import graft.ext.{Curation, Dedup, TextStats}
    val docs = graft.Tables.documents(spark, d).select("doc_id", "source", "text")
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    val mid = pmod(col("doc_id"), lit(1000000L))
    val planted = corpus.select(col("doc_id"), col("source"),
      concat(col("text"), lit(" contact user"), mid, lit("@example.com"),
        lit(" or +1 (555) 010-"), mid,
        lit(" from 192.168."), pmod(mid, lit(256)), lit(".17")).as("text"))
    for (round <- 1 to 2) {
      t(s"[$round] corpus count") { corpus.count() }
      t(s"[$round] + redact") {
        planted.withColumn("text", Curation.redactPii(col("text"))).count() }
      val clean = planted.withColumn("text", Curation.redactPii(col("text")))
      t(s"[$round] + qualityKeep") {
        clean.filter(TextStats.qualityKeep(col("text"))).count() }
      val quality = clean.filter(TextStats.qualityKeep(col("text")))
      t(s"[$round] + exactDedup") {
        Dedup.exactDedup(quality, "doc_id", "text").count() }
      val deduped = Dedup.exactDedup(quality, "doc_id", "text")
      t(s"[$round] + capPerKey") {
        Curation.capPerKey(deduped, "source", 20, "doc_id").count() }
      val capped = Curation.capPerKey(deduped, "source", 20, "doc_id")
      val withTokens = capped.select(col("doc_id"), col("source"),
        TextStats.wsTokenCount(col("text")).cast("long").as("n_tokens"))
      t(s"[$round] + pack") {
        Curation.packTokenBins(withTokens, "doc_id", "n_tokens", 4096L).count() }
      Caches.releaseAll(spark)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("pipe")) {
      pipeProfile(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")); spark.stop(); return
    }
    if (args.headOption.contains("plans")) {
      plans(spark, args.drop(1).toSeq,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
      spark.stop(); return
    }
    if (args.headOption.contains("etl")) { etlProfile(spark); spark.stop(); return }
    if (args.headOption.contains("incr")) {
      try {
        val r = Bench.incrementalStress(spark,
          sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"), 3)
        println(s"[scratch] incr stress: $r")
      } catch { case e: Throwable => e.printStackTrace() }
      spark.stop(); return
    }
    import graft.wiki.{AliasesJob, WikipediaSource}

    val tmpPath = Caches.newTempDir("graft_scratch")
    val tmp = tmpPath.toString
    val dump = s"$tmp/dump"
    val nLines = 1500000L
    val linesPerPage = 15L
    val nPages = math.max(1L, nLines / linesPerPage)
    // the profiler must measure the same corpus the bench writes
    Bench.writeWpDump(spark, nPages, dump, 64)

    val titleMap = spark.range(50000).select(
        concat(lit("Link "), col("id")).as("name"),
        concat(lit("Q"), col("id")).as("id"))
      .unionByName(spark.range(50000).select(
        concat(lit("Target "), col("id")).as("name"),
        concat(lit("Q"), col("id") + 50000).as("id")))
    for (round <- 1 to 2) {
      t(s"[$round] raw text scan count") {
        spark.read.text(dump).count()
      }
      t(s"[$round] raw text scan FULL (sum length)") {
        spark.read.text(dump).select(sum(length(col("value")))).collect()
      }
      t(s"[$round] xml read full text (sum length)") {
        WikipediaSource.read(spark, dump).select(sum(length(col("text")))).collect()
      }
      t(s"[$round] xml read + links explode count") {
        WikipediaSource.read(spark, dump)
          .select(explode(graft.wiki.WikiText.links(col("text"))).as("l")).count()
      }
      t(s"[$round] + groupBy count") {
        WikipediaSource.read(spark, dump)
          .select(explode(graft.wiki.WikiText.links(col("text"))).as("l"))
          .select(col("l")("alias").as("alias"), col("l")("title").as("title"))
          .groupBy("alias", "title").agg(count(lit(1))).count()
      }
      t(s"[$round] linkCounts (adds bcast join)") {
        AliasesJob.linkCounts(WikipediaSource.read(spark, dump), titleMap).count()
      }
      t(s"[$round] linkCounts + aggregate count (no write)") {
        val counts = AliasesJob.linkCounts(WikipediaSource.read(spark, dump), titleMap)
        val emptySeed = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          graft.wiki.Schemas.aliases)
        AliasesJob.aggregate(emptySeed, counts).count()
      }
      t(s"[$round] linkCounts write parquet (no aggregate)") {
        AliasesJob.linkCounts(WikipediaSource.read(spark, dump), titleMap)
          .write.mode("overwrite").parquet(s"$tmp/priors_raw")
      }
      t(s"[$round] full WP pipeline") {
        val pages = WikipediaSource.read(spark, dump)
        val counts = AliasesJob.linkCounts(pages, titleMap)
        val emptySeed = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          graft.wiki.Schemas.aliases)
        AliasesJob.aggregate(emptySeed, counts)
          .write.mode("overwrite").parquet(s"$tmp/priors")
      }
    }
    Caches.deleteNow(tmpPath)
    spark.stop()
  }
}
