package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, the most recent right row
  * with `right.ts <= left.ts` in the same key group — the canonical
  * event-to-latest-state lookup (absent from both the reference and from
  * Spark SQL's builtin surface).
  *
  * Per the custom-operator preference ladder, this composes existing
  * operators (no custom plan node needed): tag both sides, union, and
  * carry the right payload forward with `last(ignoreNulls)` over an
  * event-time window. One shuffle on the key — the same cost as the
  * sort-merge an ASOF-native engine pays. Right-side payload values that
  * are genuinely NULL are treated as absent (carried over), documented.
  */
object AsOfJoin {

  /** @param rightCols right payload columns to carry; appear in the output
    *                  suffixed with `suffix` (NULL when no right row is
    *                  at-or-before the left row's timestamp)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           rightCols: Seq[String], suffix: String = "_asof"): DataFrame = {
    val l = left.withColumn("__is_left", lit(1))
    val r0 = right.select((keys :+ tsCol).map(col) ++ rightCols.map(col): _*)
    val r = rightCols.foldLeft(r0)((d, c) => d.withColumnRenamed(c, c + suffix))
      .withColumn("__is_left", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts => `>=` semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightCols.foldLeft(unioned)((d, c) =>
      d.withColumn(c + suffix, last(col(c + suffix), ignoreNulls = true).over(w)))
    carried.filter(col("__is_left") === 1)
      .drop("__is_left")
  }
}
