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
