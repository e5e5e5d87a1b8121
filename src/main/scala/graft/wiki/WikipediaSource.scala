package graft.wiki

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3/S10 — Wikipedia XML article-dump source (SURVEY.md §2.1).
  *
  * The reference hand-assembles `<page>` elements from a line stream with a
  * state machine tracking `<revision>` scope (ref /root/reference/scripts/
  * wiki/wikipedia.py:302-422). Spark 4's native XML source does the page
  * assembly and revision scoping declaratively via `rowTag`, and splits the
  * input across executors — a page never straddles a partition.
  */
/** Serializable Hadoop-Configuration carrier: executor tasks must see the
  * session's filesystem config, and `Configuration` itself is not
  * `java.io.Serializable` (it IS Hadoop-`Writable`, which this bridges).
  */
private[wiki] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object WikipediaSource {

  /** Pages as (title, id, ns, text). `id` is the page id (the XML source's
    * nesting makes the reference's revision/contributor-id exclusion
    * structural instead of stateful).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "page")
      .schema(Schemas.page)
      .load(path)
      .select(
        col("title"),
        col("id").cast("string").as("article_id"),
        col("ns"),
        col("revision.text").as("text"))

  /** Multistream parallel reader — the 100 TB path for ONE huge dump file.
    *
    * A real `pages-articles-multistream.xml.bz2` is a concatenation of
    * independent bz2 streams (~100 complete pages each) plus a companion
    * index (`...-index.txt[.bz2]`, lines `offset:page_id:title`; the
    * reference seeks it single-threaded, ref /root/reference/scripts/wiki/
    * wikipedia.py:302-425). The native XML source decodes the concatenation
    * correctly but reads the whole file in ONE task (bz2 XML scans don't
    * split — MultistreamBz2Spec pins this), i.e. single-threaded for a
    * 20 GB dump. This reader turns the index's distinct offsets into
    * (start, end) byte ranges, fans the ranges out across executors, and
    * each task seeks + decompresses just its own stream and StAX-parses its
    * pages — embarrassingly parallel, no shuffle, O(streams) tasks, no
    * driver-side data. Output schema == [[read]].
    *
    * The header stream (`<mediawiki><siteinfo>…`) and the trailing
    * `</mediawiki>` stream contain no pages and are skipped by the page
    * scanner, so the ranges can safely cover the entire file.
    */
  def readMultistream(spark: SparkSession, dumpPath: String,
                      indexPath: String): DataFrame = {
    import spark.implicits._
    // distinct stream offsets; the index is tiny relative to the dump
    // (one line per page) and reduces to one row per STREAM here
    val offsets = spark.read.text(indexPath)
      .select(split(col("value"), ":").getItem(0).cast("long").as("off"))
      .filter(col("off").isNotNull)
      .distinct().orderBy("off")
      .as[Long].collect()
    readFromOffsets(spark, dumpPath, offsets)
  }

  /** Index-less fallback: same parallel read, stream offsets discovered
    * by [[discoverStreamOffsets]] instead of the companion index.
    */
  def readMultistream(spark: SparkSession, dumpPath: String): DataFrame =
    readFromOffsets(spark, dumpPath, discoverStreamOffsets(spark, dumpPath))

  /** Discover a multistream bz2's stream offsets by scanning for the
    * byte-aligned stream-header magic — `"BZh"` + level digit + the
    * 6-byte block magic `0x314159265359` — for when the companion index
    * is absent or stale. Every concatenated stream starts byte-aligned
    * with this 10-byte header; INSIDE a stream the block magic recurs
    * only at bit-unaligned block boundaries and never right behind a
    * fresh `BZh<digit>`, so a byte-aligned false positive needs ~2^72
    * coincidental bits (and would still be caught structurally by the
    * decode). The scan fans the file out in 32 MB chunks with a 9-byte
    * overlap — distributed, no driver-side data beyond the offset list.
    */
  def discoverStreamOffsets(spark: SparkSession, dumpPath: String): Array[Long] = {
    import spark.implicits._
    val fileLen = {
      val p = new org.apache.hadoop.fs.Path(dumpPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }
    val chunk = 32L * 1024 * 1024
    // an empty file discovers no streams (and repartition(0) would throw)
    val nChunks = math.max(1, ((fileLen + chunk - 1) / chunk).toInt)
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    spark.createDataset(0 until nChunks)
      .repartition(math.min(nChunks,
        spark.sparkContext.defaultParallelism * 2))
      .mapPartitions { it =>
        val p = new org.apache.hadoop.fs.Path(dumpPath)
        val fs = p.getFileSystem(confBc.value.value)
        val in = fs.open(p)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        it.flatMap { ci =>
          val start = ci.toLong * chunk
          val end = math.min(start + chunk, fileLen)
          // 9 overlap bytes so a header straddling the chunk edge is
          // seen by exactly one task (matches are reported by START)
          val readLen = (math.min(end + 9, fileLen) - start).toInt
          val buf = new Array[Byte](readLen)
          in.readFully(start, buf)
          val lim = (end - start).toInt
          val hits = scala.collection.mutable.ArrayBuffer.empty[Long]
          var i = 0
          while (i < lim) {
            if (i + 9 < readLen &&
                buf(i) == 'B' && buf(i + 1) == 'Z' && buf(i + 2) == 'h' &&
                buf(i + 3) >= '1' && buf(i + 3) <= '9' &&
                buf(i + 4) == 0x31 && buf(i + 5) == 0x41 &&
                buf(i + 6) == 0x59 && buf(i + 7) == 0x26 &&
                buf(i + 8) == 0x53 && buf(i + 9) == 0x59)
              hits += start + i
            i += 1
          }
          hits
        }
      }.collect().sorted
  }

  private def readFromOffsets(spark: SparkSession, dumpPath: String,
                              offsets: Array[Long]): DataFrame = {
    import spark.implicits._
    val fileLen = {
      val p = new org.apache.hadoop.fs.Path(dumpPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }
    val bounds = (0L +: offsets).distinct.sorted
    val ranges = bounds.zip(bounds.drop(1) :+ fileLen).filter(r => r._2 > r._1)
    // executor tasks must see the SESSION's filesystem config (s3a
    // credentials/endpoints, custom schemes, kerberos) — a bare
    // `new Configuration()` silently drops it and the object-store path
    // fails even though local-FS tests pass
    val confBc = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val rows = spark.createDataset(ranges)
      .repartition(math.min(ranges.length,
        spark.sparkContext.defaultParallelism * 2))
      .mapPartitions { it =>
        // per-task: open the dump once, positional-read per range
        val p = new org.apache.hadoop.fs.Path(dumpPath)
        val fs = p.getFileSystem(confBc.value.value)
        val in = fs.open(p)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        it.flatMap { case (start, end) =>
          MultistreamCodec.pagesInRange(in, start, end)
        }
      }
    rows.toDF("title", "ns", "article_id", "text")
      .select(col("title"), col("article_id"), col("ns"), col("text"))
  }

  /** S10 — demo-dump re-writer (ref wikipedia.py:435-483): keep pages whose
    * title is in the retained entity label set (col `title`), write back as
    * an XML dump. The title set is broadcast — the reference's in-memory
    * label set, as a semi join.
    */
  def filterDumpByTitles(spark: SparkSession, inPath: String, outPath: String,
                         titles: DataFrame): Unit = {
    val pages = spark.read.format("xml")
      .option("rowTag", "page").schema(Schemas.page).load(inPath)
    pages.join(broadcast(titles.select("title").distinct()), Seq("title"), "left_semi")
      .write.mode("overwrite").format("xml").option("rowTag", "page").save(outPath)
  }
}
