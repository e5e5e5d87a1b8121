package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typo-tolerant dictionary lookup — SymSpell's deletion-neighborhood
  * trick as a Spark join. The reference's KB resolves aliases by EXACT
  * match (aliases_for_entities PK lookup); a misspelled mention finds
  * nothing. Resolving "within edit distance d" naively is a cross join
  * with a per-pair DP — never at scale. Deletion neighborhoods bound the
  * candidates instead: two strings within edit distance d share at least
  * one common variant among the strings obtainable by ≤ d character
  * DELETIONS from each (substitution = both sides delete the differing
  * position; insertion/deletion = the longer side deletes it), so the
  * lookup is a plain equi-join on precomputed variants followed by the
  * codegen'd banded-DP verification (`levenshtein(l, r, threshold)`).
  *
  * Scale shape: the dict side's neighborhood is data to PRECOMPUTE and
  * persist like any index (|s|+1 variants per term at d=1 — linear);
  * the query side explodes the same way at ask time; the join is
  * hash-partitioned on the variant. No cross join, no UDF — the variant
  * generator is `sequence` + `transform` (codegen), the verifier the
  * built-in thresholded levenshtein.
  */
object FuzzyLookup {

  /** The ≤`d`-deletion neighborhood of `s` (the string itself plus every
    * string reachable by up to `d` single-character deletions) as one
    * array column — `sequence` + `transform` + `substr`, all codegen.
    */
  def neighborhood(s: Column, d: Int): Column = {
    require(d >= 1 && d <= 2, s"deletion depth must be 1 or 2, got $d")
    val del1 = (x: Column) =>
      transform(sequence(lit(1), length(x)), i =>
        concat(x.substr(lit(1), i - 1), x.substr(i + 1, length(x))))
    val lvl1 = array_union(array(s), del1(s))
    if (d == 1) lvl1
    else array_distinct(concat(lvl1,
      flatten(transform(del1(s), v =>
        transform(sequence(lit(1), length(v)), i =>
          concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v))))))))
  }

  /** Dict-side index: one (variant, term) row per neighborhood member —
    * precompute once, persist/bucket on `variant` like any index.
    */
  def dictVariants(dict: DataFrame, dictCol: String, d: Int = 1): DataFrame =
    dict.select(col(dictCol).as("__term"))
      .distinct()
      .select(explode(neighborhood(col("__term"), d)).as("__variant"),
        col("__term"))
      .distinct()

  /** Resolve each query string to every dict term within edit distance
    * `maxDist`: neighborhood equi-join → distinct candidate pairs →
    * thresholded-levenshtein verification. Output: (queryCol, dictCol,
    * dist).
    */
  def lookup(queries: DataFrame, queryCol: String,
             dict: DataFrame, dictCol: String, maxDist: Int = 1): DataFrame =
    verify(queryVariants(queries, queryCol, maxDist),
      dictVariants(dict, dictCol, maxDist), queryCol, dictCol, maxDist)

  /** Persist the dict-side neighborhood as a bucketed table keyed on the
    * variant — the precomputed index: lookups pay only the (small) query
    * side's explode and shuffle; the dict side scans bucket-aligned with
    * no Exchange. Rebuild on dict change (or append new terms' variant
    * rows — the layout is append-friendly).
    */
  def writeDictIndex(dict: DataFrame, dictCol: String, table: String,
                     d: Int = 1, numBuckets: Int = 32): Unit =
    graft.catalog.Catalog.writeBucketed(
      dictVariants(dict, dictCol, d), table, "__variant", numBuckets)

  /** [[lookup]] against a [[writeDictIndex]] table. */
  def lookupIndexed(queries: DataFrame, queryCol: String, indexTable: String,
                    dictCol: String, maxDist: Int = 1): DataFrame =
    verify(queryVariants(queries, queryCol, maxDist),
      queries.sparkSession.table(indexTable), queryCol, dictCol, maxDist)

  private def queryVariants(queries: DataFrame, queryCol: String,
                            d: Int): DataFrame =
    queries.select(col(queryCol).as("__q")).distinct()
      .select(explode(neighborhood(col("__q"), d)).as("__variant"),
        col("__q"))
      .distinct()

  private def verify(qv: DataFrame, dv: DataFrame, queryCol: String,
                     dictCol: String, maxDist: Int): DataFrame =
    qv.join(dv, Seq("__variant"))
      .select(col("__q"), col("__term")).distinct()
      .withColumn("dist", levenshtein(col("__q"), col("__term"), maxDist))
      .filter(col("dist") >= 0) // thresholded levenshtein: -1 = exceeded
      .select(col("__q").as(queryCol), col("__term").as(dictCol), col("dist"))
}
