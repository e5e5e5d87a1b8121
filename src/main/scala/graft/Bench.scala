package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {

  /** Wiki-ETL throughput (the one direct baseline comparison BASELINE.md
    * allows: the reference ingests Wikidata at ~1.5-2.2k lines/s
    * single-threaded). Synthesizes an `nLines`-entity JSON dump shaped
    * like the real one (item/property mix, excluded-QID and
    * deprecated-rank claims, 80% sitelink coverage, per-entity aliases),
    * written as splittable bz2 parts, then times the full
    * EntitiesJob + AliasesJob ingest materializing all three catalog
    * tables to parquet. Dump generation is excluded from the timing.
    */
  def wikiEtlThroughput(spark: SparkSession, nLines: Long): (Double, Double) = {
    import graft.wiki.{AliasesJob, EntitiesJob, Schemas, WikidataSource}
    val tmp = java.nio.file.Files.createTempDirectory("graft_etl").toString
    val dump = s"$tmp/dump"

    val id = col("id")
    val claim = (target: org.apache.spark.sql.Column, rank: org.apache.spark.sql.Column) =>
      struct(struct(struct(struct(target.as("id")).as("value")).as("datavalue")).as("mainsnak"),
        rank.as("rank"))
    val lines = spark.range(nLines).select(concat(to_json(struct(
      when(pmod(id, lit(20)) === 0, "property").otherwise("item").as("type"),
      concat(lit("Q"), id).as("id"),
      map(
        lit("P31"), array(claim(
          // ~3% excluded-QID claims; 1/13 of those deprecated (kept)
          when(pmod(id, lit(31)) === 0, "Q4167836")
            .otherwise(concat(lit("Q"), pmod(id, lit(1000)))),
          when(pmod(id, lit(13)) === 0, "deprecated").otherwise("normal"))),
        lit("P279"), array(claim(
          concat(lit("Q"), pmod(id + 7, lit(1000))), lit("normal")))
      ).as("claims"),
      // 80% of entities have the enwiki sitelink (the F4 row gate)
      when(pmod(id, lit(5)) =!= 0,
        map(lit("enwiki"), struct(concat(lit("Title "), id).as("title"))))
        .otherwise(lit(null).cast("map<string,struct<title:string>>"))
        .as("sitelinks"),
      map(lit("en"), struct(lit("en").as("language"),
        concat(lit("Label "), id).as("value"))).as("labels"),
      map(lit("en"), struct(lit("en").as("language"),
        concat(lit("Description of entity "), id).as("value"))).as("descriptions"),
      map(lit("en"), array(
        struct(lit("en").as("language"),
          concat(lit("alias "), pmod(id, lit(5000))).as("value")),
        struct(lit("en").as("language"),
          concat(lit("alt "), id).as("value")))).as("aliases"))),
      lit(",")).as("value"))
    lines.repartition(64)
      .write.mode("overwrite").option("compression", "bzip2").text(dump)

    val t0 = System.nanoTime()
    val ents = EntitiesJob.run(WikidataSource.read(spark, dump), singleScan = true)
    ents.entities.write.mode("overwrite").parquet(s"$tmp/entities")
    ents.properties.write.mode("overwrite").parquet(s"$tmp/properties")
    val emptyLinks = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.aliases)
    AliasesJob.aggregate(ents.aliases, emptyLinks)
      .write.mode("overwrite").parquet(s"$tmp/aliases")
    val dt = (System.nanoTime() - t0) / 1e9
    (nLines / dt, dt)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: trigger codegen/JIT for the shared kernels (scan,
    // shuffle, vector expressions, signature UDFs) so per-query numbers
    // reflect steady state instead of charging first-use compilation to
    // whichever query happens to run first alphabetically.
    try {
      import graft.ext.{Dedup, Similarity}
      val docs = Tables.documents(spark, sfDir).limit(64).cache()
      docs.count()
      Dedup.withMinhashSignature(docs, "text", "s").count()
      Dedup.withSimhash(docs, "text", "s").count()
      val emb = Tables.embeddings(spark, sfDir).limit(64)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .cache()
      emb.count()
      Similarity.bruteForceTopK(emb, emb.limit(2), 3).count()
      docs.unpersist(); emb.unpersist()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup skipped: ${e.getMessage}")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-30s $dt%8.2f s")
      name -> dt
    }
    val etlLines = sys.env.getOrElse("SPARK_GRAFT_ETL_LINES", "1000000").toLong
    val (etlRate, etlSec) =
      if (etlLines > 0)
        try wikiEtlThroughput(spark, etlLines)
        catch { case e: Throwable =>
          System.err.println(s"[bench] wiki_etl FAILED: ${e.getMessage}"); (0.0, 0.0)
        }
      else (0.0, 0.0)
    System.err.println(f"[bench] wiki_etl_throughput: $etlRate%.0f lines/s ($etlLines lines in $etlSec%.1f s)")
    val qs = (results :+ ("wiki_etl_throughput" -> etlSec))
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""etl_lines":$etlLines,"etl_sec":$etlSec,"etl_lines_per_sec":${etlRate.round},"sf":"$sfDir"}"""
    // Emit on stdout (build.sbt passes forked output through unprefixed)
    // AND persist to a file so the result survives any log wrapping.
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_result.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
