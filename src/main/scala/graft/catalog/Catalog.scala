package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB catalog (SURVEY.md §4.1: the
  * reference's secondary indexes become partitioning/bucketing + min-max
  * pruning here).
  *
  * Bucketing pre-shuffles a table by its join/aggregation key at write
  * time: two tables bucketed on the same key with the same bucket count
  * join with NO exchange on either side — the shuffle is paid once at
  * ingest instead of per query. This is how the engine's `aliases` /
  * `entities` / `articles` tables co-locate on `entity_id` at scale.
  */
object Catalog {

  /** Write a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int = 32,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Write hive-style partitioned parquet (partition pruning on
    * `partitionCol` — the engine's answer to the reference's secondary
    * indexes for low-cardinality predicates).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCol).parquet(path)

  /** Small-file compaction (the OPTIMIZE of lakehouse tables): rewrite a
    * parquet directory into ~`targetFileBytes`-sized files. Incremental
    * ingest (streaming sinks, per-round appends) accumulates small files
    * whose per-file open/footer cost eventually dominates scans; the fix
    * is a periodic rewrite sized from the ACTUAL on-disk bytes. Returns
    * (filesBefore, filesAfter). Uses a temp-dir + atomic-ish swap so a
    * failed rewrite never destroys the input.
    */
  def compactParquet(spark: SparkSession, path: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(hPath)
    // a hive-partitioned layout has its data in subdirectories — a flat
    // rewrite would silently destroy the partition structure (and with
    // it every pruning path); compact each partition directory instead
    require(!entries.exists(e => e.isDirectory &&
        e.getPath.getName.contains("=")),
      s"$path is a partitioned table — compact its partition directories " +
        "individually, a flat rewrite would drop the partitioning")
    val dataFiles = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(dataFiles.nonEmpty, s"no parquet data files directly under $path")
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compact_tmp")
    val bak = new org.apache.hadoop.fs.Path(path + "._compact_old")
    fs.delete(bak, true) // stale backup from a crashed prior run
    spark.read.parquet(path).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(hPath, bak), s"could not move $path aside to $bak")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(bak, hPath) // restore; the input is never lost
      throw new IllegalStateException(s"swap failed, restored original $path")
    }
    fs.delete(bak, true)
    val after = fs.listStatus(hPath)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
  }

  /** Persist the wikid catalog bucketed by its join keys: entities and
    * aliases co-bucketed on the entity id so loadEntities' joins and the
    * A1 aggregation run shuffle-free.
    */
  def saveWikidCatalog(spark: SparkSession, entities: DataFrame,
                       aliases: DataFrame, articles: DataFrame,
                       prefix: String = "graft", numBuckets: Int = 32): Unit = {
    writeBucketed(entities.withColumnRenamed("id", "entity_id"),
      s"${prefix}_entities", "entity_id", numBuckets)
    writeBucketed(aliases, s"${prefix}_aliases", "entity_id", numBuckets)
    writeBucketed(articles, s"${prefix}_articles", "entity_id", numBuckets)
  }
}
