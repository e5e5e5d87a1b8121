package graft.wiki

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S9 — Wikidata JSON-lines dump source (SURVEY.md §2.1).
  *
  * The dump is one JSON entity per line, wrapped in `[` / `]` with trailing
  * commas (ref /root/reference/scripts/wiki/wikidata.py:96-111). bz2 is a
  * splittable Hadoop codec, so `spark.read.text` parallelizes the scan that
  * the reference streams single-threaded; the per-line cleanup becomes a
  * codegen'd projection and `from_json` with the frozen schema replaces
  * `json.loads` (never inferSchema at 100 TB).
  */
object WikidataSource {

  /** Raw line scan with the reference's line cleanup: strip whitespace, drop
    * a trailing comma, drop the `[`/`]` wrapper lines (length <= 1).
    */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(regexp_replace(trim(col("value")), ",$", "").as("line"))
      .filter(length(col("line")) > 1)

  /** Parsed entity records in the frozen `Schemas.wikidata` shape. */
  def read(spark: SparkSession, path: String): DataFrame =
    parsed(readLines(spark, path))

  private def parsed(lines: DataFrame): DataFrame =
    lines
      .select(from_json(col("line"), Schemas.wikidata).as("e"))
      .filter(col("e").isNotNull && col("e.id").isNotNull)
      .select("e.*")

  /** First `n` entity lines in FILE order — the reference's `--limit`
    * stream-stop semantic (ref wikidata.py:103-104: stop after N lines of
    * the sequential scan). A plain `df.limit(n)` after a parallel scan
    * returns an arbitrary N rows; here `zipWithIndex` indexes rows in
    * partition order, which for a non-shuffled text scan is exactly
    * byte/file order (across files: the scan's lexicographic file
    * listing). Costs one extra pass to materialize the index — pay it
    * only when the "first N of the dump" semantic actually matters.
    */
  def readLimited(spark: SparkSession, path: String, n: Long): DataFrame = {
    import spark.implicits._
    val firstN = readLines(spark, path).as[String].rdd
      .zipWithIndex
      .filter(_._2 < n)
      .map(_._1)
    parsed(spark.createDataset(firstN).toDF("line"))
  }

  /** Filter-terms config loader (ref /root/reference/scripts/utils.py:23-30:
    * `read_filter_terms` reads configs/filter_terms.txt, one term per line,
    * into a set). Same contract: newline-stripped distinct terms; blank
    * lines dropped. The result feeds `filterDump` / `filterDumpByTitles`.
    */
  def readFilterTerms(path: String): Set[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().map(_.stripLineEnd).filter(_.nonEmpty).toSet
    finally src.close()
  }

  /** S9 — demo-dump filter/re-writer (ref wikidata.py:273-321): keep lines
    * containing any lower-cased filter term (substring match, pre-JSON-parse)
    * plus the wrapper lines, re-emit as a bz2 text dump.
    */
  def filterDump(spark: SparkSession, inPath: String, outPath: String,
                 filterTerms: Seq[String]): Unit = {
    val terms = filterTerms.map(_.toLowerCase)
    val raw = spark.read.text(inPath)
    val keep = terms.map(t => lower(col("value")).contains(t)).reduce(_ || _) ||
      length(trim(col("value"))) <= 1
    raw.filter(keep)
      .write.mode("overwrite").option("compression", "bzip2").text(outPath)
  }
}
