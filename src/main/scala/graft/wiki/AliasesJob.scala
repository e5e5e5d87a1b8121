package graft.wiki

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Alias-count job (A1 — the single most important semantic in the engine,
  * SURVEY.md §7.4): Wikidata-declared aliases seed count=1 each; Wikipedia
  * link anchors add occurrence counts; dev articles are excluded.
  *
  * The reference accumulates a global driver dict (`map_alias_to_link`,
  * ref /root/reference/scripts/wiki/wikipedia.py:28,84-172) flushed as
  * SQLite upserts — O(distinct aliases) driver RAM, its scalability
  * bottleneck (SURVEY.md §4.1). Here it is a union + partial/final hash
  * aggregation: one shuffle on (alias, entity_id), no state anywhere.
  */
object AliasesJob {

  /** Wikipedia link pass (T1+T2+J3, ref wikipedia.py:84-172): extract link
    * anchors from non-dev pages, count (alias, title) pairs, resolve titles
    * to QIDs via the broadcast title map (unresolvable titles dropped).
    */
  def linkCounts(pages: DataFrame, titleMap: DataFrame): DataFrame =
    pages
      .filter(!WikiText.isDev(col("article_id")))          // F11
      .select(explode(WikiText.links(col("text"))).as("l"))
      .select(col("l")("alias").as("alias"), col("l")("title").as("title"))
      .groupBy("alias", "title").agg(count(lit(1)).as("count"))
      .join(broadcast(titleMap.select(col("name").as("title"), col("id").as("entity_id"))),
        Seq("title"), "inner")                             // J3
      .select(col("alias"), col("entity_id"), col("count"))

  /** A1 — final alias table: seeds ∪ link counts, summed per
    * (alias, entity_id). Replaces the reference's upsert sink
    * (ref wikidata.py:262-269, wikipedia.py:104-116).
    */
  def aggregate(seedAliases: DataFrame, linkAliases: DataFrame): DataFrame =
    seedAliases.select("alias", "entity_id", "count")
      .unionByName(linkAliases.select("alias", "entity_id", "count"))
      .groupBy("alias", "entity_id")
      .agg(sum("count").as("count"))

  def run(seedAliases: DataFrame, pages: DataFrame, titleMap: DataFrame): DataFrame =
    aggregate(seedAliases, linkCounts(pages, titleMap))

  /** Ids of the pages whose anchors [[linkCounts]] counts (the F11
    * non-dev gate; null ids are excluded by it too) — the bookkeeping
    * set an incremental re-parse persists so each page's anchors enter
    * the alias counts exactly once. The articles table cannot serve as
    * this set: pages that never become articles (redirects, meta pages,
    * titles matching no entity) still contribute link counts.
    */
  def countedPageIds(pages: DataFrame): DataFrame =
    pages.filter(!WikiText.isDev(col("article_id")))
      .select("article_id").distinct()
}
