package graft.wiki

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-ingest job: Wikidata dump -> `entities`, `properties`, and the
  * seed `aliases` rows (SURVEY.md §2: F1-F6, F3-F5, T5, T6, S4).
  *
  * The reference streams the dump single-threaded, accumulating driver-side
  * dicts flushed every 5,000 lines (ref /root/reference/scripts/wiki/
  * wikidata.py:41-270). Here the whole job is one declarative plan: the
  * filters are codegen'd predicates pushed onto the scan, the dedups are
  * distributed, and no driver state exists at any scale.
  */
object EntitiesJob {

  /** @param release drops the `singleScan` staging cache once the caller
    *   has materialized all consumed outputs (no-op otherwise) — the
    *   "returned handle" contract, so long-lived sessions don't leak it.
    */
  case class Result(entities: DataFrame, properties: DataFrame, aliases: DataFrame,
                    release: () => Unit = () => ())

  /** Claim-based negative filter (F2, ref wikidata.py:117-139): drop the
    * entity if any non-`deprecated` P31/P279 claim targets an excluded QID.
    */
  private def keepByClaims(excludeList: Seq[String]) = {
    val excluded = typedLit(excludeList)
    def bad(prop: String) = exists(
      coalesce(col("claims").getItem(prop), array()),
      // coalesce: a claim with no datavalue id is never "excluded"
      // (Python `None in list` is False, ref wikidata.py:128-138)
      c => c("rank") =!= "deprecated" &&
        coalesce(array_contains(excluded, c("mainsnak")("datavalue")("value")("id")),
          lit(false)))
    !(bad("P31") || bad("P279"))
  }

  /** Transform parsed dump records (Schemas.wikidata shape) into the three
    * output tables.
    *
    * @param existingIds optional resume set (F6, ref wikidata.py:90-92,
    *   112-114): records whose `id` is present are skipped — the driver-side
    *   preloaded set becomes a distributed left-anti join.
    * @param singleScan persist the filtered/projected `kept` frame so that
    *   materializing all three outputs scans the raw dump ONCE (decompress +
    *   JSON parse dominate ingest cost). `kept` is orders of magnitude
    *   smaller than the dump; at cluster scale the equivalent is writing it
    *   as a staging table. Caller unpersists via the returned handle.
    */
  def run(raw: DataFrame, lang: String = "en",
          excludeList: Seq[String] = Namespaces.defaultExcludeList,
          existingIds: Option[DataFrame] = None,
          singleScan: Boolean = false): Result = {
    val siteFilter = s"${lang}wiki"

    val resumed = existingIds match {
      case Some(ids) => raw.join(ids.select(col("id")), Seq("id"), "left_anti")
      case None => raw
    }

    // A7 — in-plan parse counters (same shape as ArticlesJob: the
    // reference's per-flush stats at wikidata.py:251-257 become observed
    // metrics on the job's own action)
    val items = resumed
      .observe("graft.entities.records", count(lit(1)).as("n_records"))
      .filter(col("type") === "item")            // F1 (ref wikidata.py:115-117)
      .filter(keepByClaims(excludeList))         // F2
      .observe("graft.entities.items", count(lit(1)).as("n_items"))

    // F3/F4: language projection + sitelink gate. Entities without a
    // {lang}wiki sitelink never enter title_to_id and are dropped entirely
    // (ref wikidata.py:168-175,232) — the sitelink filter IS the row filter.
    val keptBase = items
      .select(
        col("id"),
        // T6: the two matched claim groups re-serialized, P31 before P279,
        // only when present (ref wikidata.py:120-126,233). Schema-limited
        // to the consumed fields — documented divergence from the raw dump
        // JSON (SURVEY.md §1.2).
        to_json(filter(
          array(col("claims").getItem("P31"), col("claims").getItem("P279")),
          g => g.isNotNull)).as("claims"),
        col("claims").as("claims_map"),
        col("sitelinks").getItem(siteFilter).getField("title").as("name"),
        col("descriptions").getItem(lang).getField("value").as("description"),
        col("labels").getItem(lang).getField("value").as("label"),
        coalesce(col("aliases").getItem(lang), array()).as("lang_aliases"))
      .filter(col("name").isNotNull)             // F4 sitelink gate
      // the reference's title_to_id dict keeps one entry per title
      // (last wins, ref wikidata.py:171); titles are unique in practice —
      // deterministic arbitrary-survivor dedup documented as equivalent
      .dropDuplicates("name")
      .observe("graft.entities.persisted", count(lit(1)).as("n_persisted"))

    val kept =
      if (singleScan) graft.Caches.stage(keptBase)
      else keptBase

    val entities = kept.select("id", "claims", "name", "description", "label")

    // T5/A5 — property edges: every claim's referent per property,
    // set-deduped (ref wikidata.py:149-166,229,245-247)
    val properties = kept
      .select(col("id").as("from_entity_id"), explode(col("claims_map")).as(Seq("property_id", "cs")))
      .select(col("property_id"), col("from_entity_id"),
        explode(col("cs")).as("c"))
      .select(col("property_id"), col("from_entity_id"),
        col("c")("mainsnak")("datavalue")("value")("id").as("to_entity_id"))
      .filter(col("to_entity_id").isNotNull)
      .dropDuplicates("property_id", "from_entity_id", "to_entity_id")

    // seed alias rows, count=1 per declared alias (ref wikidata.py:242-243);
    // duplicates accumulate downstream in AliasesJob's A1 aggregation
    val aliases = kept
      .select(col("id").as("entity_id"), explode(col("lang_aliases")).as("a"))
      .select(col("a")("value").as("alias"), col("entity_id"), lit(1L).as("count"))
      .filter(col("alias").isNotNull)

    Result(entities, properties, aliases,
      release = if (singleScan) () => { kept.unpersist(blocking = false); () }
                else () => ())
  }

  /** Convenience: dump file -> tables. */
  def fromDump(spark: SparkSession, path: String, lang: String = "en"): Result =
    run(WikidataSource.read(spark, path), lang)
}
