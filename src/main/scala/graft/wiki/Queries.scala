package graft.wiki

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's library query surface (SURVEY.md §2.4, §2.6, §3.3):
  * `load_entities` (J1/A4), alias prior probabilities (A2/A3), the entity
  * title map (J2), and QID point lookup (F15).
  */
object Queries {

  /** J2 — entity title -> QID map (ref /root/reference/scripts/wiki/
    * wikipedia.py:62-81). Small projection of `entities`; callers broadcast
    * it — the canonical map-side join replacing the driver dict.
    */
  def titleMap(entities: DataFrame): DataFrame =
    entities.select(col("name"), col("id"))

  /** J1 + A4 — `load_entities` (ref /root/reference/scripts/wiki/
    * __init__.py:116-182): entities ⟕ articles ⟕ per-entity alias rollup,
    * alias set unioned with {name, article_title, label}.
    *
    * The reference left-joins the alias table row-wise then GROUP BYs the
    * multiplied rows and splits a GROUP_CONCAT on "," (corrupting aliases
    * that contain commas). Pre-aggregating aliases before the join avoids
    * the row multiplication AND the corruption — deliberate, documented
    * divergence (SURVEY.md §2.6 A4). Output aliases are sorted for
    * determinism (SQLite's concat order is undefined).
    *
    * @param qids F15 point-lookup filter; empty = all entities
    *   (ref __init__.py:170-181's `TRUE OR id IN (...)` trick).
    */
  def loadEntities(entities: DataFrame, articles: DataFrame, aliases: DataFrame,
                   qids: Seq[String] = Seq.empty): DataFrame = {
    val base = if (qids.nonEmpty) entities.filter(col("id").isin(qids.distinct: _*))
               else entities

    val aliasAgg = {
      val a = if (qids.nonEmpty) aliases.filter(col("entity_id").isin(qids.distinct: _*))
              else aliases
      a.groupBy("entity_id")
        .agg(collect_list("alias").as("alias_list"), sum("count").as("alias_count"))
    }

    base
      .join(articles.select(col("entity_id").as("id"),
          col("title").as("article_title"), col("content").as("article_text")),
        Seq("id"), "left")
      .join(aliasAgg.withColumnRenamed("entity_id", "id"), Seq("id"), "left")
      .select(
        col("id").as("qid"),
        col("name"),
        // alias set = declared+link aliases ∪ {name, article_title, label},
        // nulls/empties dropped (ref __init__.py:134-147)
        sort_array(array_distinct(filter(
          concat(coalesce(col("alias_list"), array()),
            array(col("name"), col("article_title"), col("label"))),
          a => a.isNotNull && length(a) > 0))).as("aliases"),
        coalesce(col("alias_count"), lit(0L)).as("count"),
        col("description"),
        col("article_title"),
        col("article_text"))
  }

  /** Typed variant returning Dataset[Entity] (the reference returns
    * Dict[str, Entity], ref schemas.py:10-19).
    */
  def loadEntitiesTyped(spark: SparkSession, entities: DataFrame,
                        articles: DataFrame, aliases: DataFrame,
                        qids: Seq[String] = Seq.empty): Dataset[Entity] = {
    import spark.implicits._
    loadEntities(entities, articles, aliases, qids)
      .withColumnRenamed("article_title", "articleTitle")
      .withColumnRenamed("article_text", "articleText")
      .as[Entity]
  }

  /** A3 — per-(alias, entity) prior probability: count / max(Σcount, 1)
    * over the alias partition (ref __init__.py:218-224) — the reference's
    * only window-shaped computation, done here as a window aggregate.
    */
  def aliasPriorsFlat(aliases: DataFrame): DataFrame = {
    val w = Window.partitionBy("alias")
    aliases.withColumn("prior",
      col("count").cast("double") / greatest(sum("count").over(w), lit(1L)))
  }

  /** A2 + A3 — grouped form mirroring
    * `load_alias_entity_prior_probabilities` (ref __init__.py:186-224):
    * alias -> paired entity/prior arrays. `collect_list(struct)` keeps the
    * pairing that the reference's twin GROUP_CONCATs rely on implicitly;
    * sorted by entity_id for determinism.
    */
  def aliasPriors(aliases: DataFrame): DataFrame =
    aliasPriorsFlat(aliases)
      .groupBy("alias")
      .agg(sort_array(collect_list(struct(col("entity_id"), col("prior")))).as("eps"))
      .select(col("alias"),
        col("eps")("entity_id").as("entities"),
        col("eps")("prior").as("priors"))
}
