package graft.wiki

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental, idempotent dump ingest (SURVEY.md §2.11).
  *
  * The reference resumes by preloading every already-ingested id into a
  * Python set and skipping matches (ref wikidata.py:90-92,112-114) — O(DB)
  * driver memory per run. Here resume is the streaming checkpoint: the
  * file source tracks which dump files were already processed, so a rerun
  * ingests only new files, with exactly-once sink semantics and no
  * id-set anywhere. `Trigger.AvailableNow` drains everything currently
  * present and stops — incremental batch.
  */
object IncrementalIngest {

  /** Ingest all new Wikidata dump files from `dumpDir` into the parquet
    * catalog under `outDir`. Safe to call repeatedly; each call processes
    * only files the checkpoint has not seen.
    *
    * @return number of micro-batches executed in this run
    */
  def ingestEntities(spark: SparkSession, dumpDir: String, outDir: String,
                     checkpoint: String, lang: String = "en"): Long = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", "16")
      .text(dumpDir)
      .select(regexp_replace(trim(col("value")), ",$", "").as("line"))
      .filter(length(col("line")) > 1)
      .select(from_json(col("line"), Schemas.wikidata).as("e"))
      .filter(col("e").isNotNull && col("e.id").isNotNull)
      .select("e.*")

    var batches = 0L
    val q = lines.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val r = EntitiesJob.run(batch, lang)
        r.entities.write.mode("append").parquet(s"$outDir/entities")
        r.properties.write.mode("append").parquet(s"$outDir/properties")
        r.aliases.write.mode("append").parquet(s"$outDir/alias_seeds")
        batches += 1
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches
  }
}
