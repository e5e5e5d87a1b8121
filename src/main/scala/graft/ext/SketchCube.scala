package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental distinct-count cube: per-key mergeable HLL sketches,
  * appended batch-by-batch into a versioned table.
  *
  * The 100 TB problem this solves: "distinct users per key over all
  * history" re-scans the raw table on every ask — at scale that is the
  * whole lake. Because DataSketches HLL unions losslessly in register
  * space, each ingested batch can instead reduce to ONE sketch row per
  * key (`hll_sketch_agg`) and append O(keys) rows; the query unions
  * sketches per key (`hll_union_agg`) and estimates — cost
  * O(keys × batches), independent of raw history size, and
  * [[graft.catalog.VersionedTable]] appends keep every cube state
  * snapshot-consistent and time-travelable (ask "distinct users as of
  * version N" for free). Compaction = [[merge]], which folds all batch
  * sketches into one row per key as a data-equivalent commit.
  *
  * `lgK` fixes the sketch precision at cube creation (relative error
  * ≈ 1.04/√2^lgK — 12 ⇒ ~1.6%); unions require a consistent lgK, so
  * pass the same value on every append (the cube's analogue of the
  * signature store's pinned meta).
  */
object SketchCube {

  /** Reduce a raw batch to one HLL sketch per key and append it as a
    * versioned-table commit. O(batch) + O(keys) rows written.
    */
  def appendBatch(raw: DataFrame, keyCols: Seq[String], valueCol: String,
                  path: String, lgK: Int = 12): Int = {
    val sketches = raw.groupBy(keyCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"))
    graft.catalog.VersionedTable.append(sketches, path, Nil)
  }

  /** Distinct estimate per key over the cube's current state (or a
    * historical `version`): union the batch sketches per key, estimate.
    */
  def distinct(spark: SparkSession, path: String, keyCols: Seq[String],
               version: Int = -1): DataFrame =
    graft.catalog.VersionedTable.read(spark, path, version)
      .groupBy(keyCols.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))")
        .as("n_approx"))

  /** Cube maintenance: fold all accumulated batch sketches into one row
    * per key, committed as a data-equivalent new version (estimates are
    * unchanged — HLL union is associative and lossless in register
    * space). Run after many appends; vacuum reclaims the batch rows.
    */
  def merge(spark: SparkSession, path: String, keyCols: Seq[String]): Int = {
    val folded = graft.catalog.VersionedTable.read(spark, path)
      .groupBy(keyCols.map(col): _*)
      .agg(expr("hll_union_agg(sketch)").as("sketch"))
    graft.catalog.VersionedTable.commit(folded, path, Nil)
  }
}
