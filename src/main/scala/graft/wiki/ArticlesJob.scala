package graft.wiki

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Article-text job: Wikipedia pages + entity title map -> `articles` and
  * `annotations` (SURVEY.md §2: F7-F10, F14, T3, T4, J4, J5, A6, S6).
  *
  * The reference is a single-threaded line state machine over the XML
  * (ref /root/reference/scripts/wiki/wikipedia.py:259-432). Here each page
  * is one row: filters are codegen'd predicates, the title->QID driver dict
  * becomes a broadcast join, and the text cleanup runs partition-parallel.
  */
object ArticlesJob {

  case class Result(articles: DataFrame, annotations: DataFrame, diagnostics: DataFrame)

  /** @param pages     (title, article_id, ns, text) from WikipediaSource.read
    * @param titleMap  (name, id) from Queries.titleMap — small side, broadcast
    * @param existingArticleIds optional resume set (F7, ref wikipedia.py:
    *   279-282,354): already-ingested article ids are skipped via anti join
    */
  def run(pages: DataFrame, titleMap: DataFrame, lang: String = "en",
          nCharLimit: Int = 1000,
          existingArticleIds: Option[DataFrame] = None): Result = {

    val resumed = existingArticleIds match {
      case Some(ids) =>
        pages.join(ids.select(col("article_id")), Seq("article_id"), "left_anti")
      case None => pages
    }

    // A7 — in-plan observability: the reference prints a parse summary
    // (n pages seen / % viable / n persisted, ref wikipedia.py:427-432).
    // `observe` collects the same counters as streaming-safe accumulators
    // on the job's own action — no extra pass, readable from
    // `df.queryExecution.observedMetrics` (asserted in WikidPipelineSpec).
    val viable = resumed
      .observe("graft.articles.pages", count(lit(1)).as("n_pages"))
      .filter(col("article_id").isNotNull && col("text").isNotNull)
      .filter(!WikiText.shouldSkip(col("text"), lang))      // F10
      .filter(!WikiText.isMetaTitle(col("title")))          // F8 (ref :496-498)
      .filter(!WikiText.isRedirect(col("text")))            // F9 (ref :507-509)
      .observe("graft.articles.viable", count(lit(1)).as("n_viable"))

    // T3 + T4: clean markup, strip links, record mention offsets
    val processed = viable
      .withColumn("proc", WikiText.processText(col("text")))
      .select(col("title"), col("article_id"),
        col("proc")("text").as("clean_text"),
        col("proc")("mentions").as("mentions"))

    // J4 — persist only pages whose title is a known entity title
    // (ref wikipedia.py:360,373-382); broadcast hash join on title
    val gated = processed
      .join(broadcast(titleMap.select(col("name").as("title"), col("id").as("entity_id"))),
        Seq("title"), "inner")
      .observe("graft.articles.persisted", count(lit(1)).as("n_persisted"))

    // F14 — truncate to nCharLimit, punctuation fixups, drop last word
    val articles = gated.select(
      col("entity_id"), col("article_id"), col("title"),
      WikiText.truncateContent(col("clean_text"), nCharLimit).as("content"))

    // J5 — mention resolution: explode offsets, resolve raw titles via the
    // same broadcast map; unresolved mentions are dropped (their surface
    // text is already in clean_text) (ref wikipedia.py:639-642)
    val annotations = gated
      .select(col("entity_id"), col("article_id"), explode(col("mentions")).as("m"))
      .select(col("entity_id"), col("article_id"),
        col("m")("mention").as("mention"), col("m")("title").as("target_title"),
        col("m")("start").as("start_pos"), col("m")("end").as("end_pos"))
      .join(broadcast(titleMap.select(col("name").as("target_title"),
        col("id").as("target_entity_id"))), Seq("target_title"), "inner")
      .select("entity_id", "article_id", "mention", "target_entity_id",
        "start_pos", "end_pos")

    // A6 — duplicate-article-ID diagnostic (ref wikipedia.py:275,413-416)
    val diagnostics = resumed.groupBy("article_id").count().filter(col("count") > 1)

    Result(articles, annotations, diagnostics)
  }
}
