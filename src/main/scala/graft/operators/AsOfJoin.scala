package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the nearest right row in the same key
  * group — backward (most recent `right.ts <= left.ts`, the canonical
  * event-to-latest-state lookup) or forward (earliest
  * `right.ts >= left.ts`), optionally bounded by a `tolerance` on the
  * timestamp gap (the pandas `merge_asof` surface). Absent from both the
  * reference and Spark SQL's builtin surface.
  *
  * Per the custom-operator preference ladder, this composes existing
  * operators (no custom plan node needed): tag both sides, union, and
  * carry the right payload across with `last`/`first(ignoreNulls)` over
  * an event-time window. One shuffle on the key — the same cost as the
  * sort-merge an ASOF-native engine pays. Right-side payload values that
  * are genuinely NULL are treated as absent (carried over), documented.
  */
object AsOfJoin {

  /** @param rightCols right payload columns to carry; appear in the output
    *                  suffixed with `suffix` (NULL when no right row
    *                  matches)
    * @param direction "backward" (latest at-or-before), "forward"
    *                  (earliest at-or-after), or "nearest" (whichever of
    *                  the two has the smaller |gap|; ties prefer
    *                  backward) — all include equal ts
    * @param tolerance max |left.ts - right.ts| in `tsCol` units; larger
    *                  gaps yield NULL payloads (match discarded)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           rightCols: Seq[String], suffix: String = "_asof",
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val l = left.withColumn("__is_left", lit(1))
    val r0 = right.select((keys :+ tsCol).map(col) ++ rightCols.map(col): _*)
    val r = rightCols.foldLeft(r0)((d, c) => d.withColumnRenamed(c, c + suffix))
      .withColumn("__rts", col(tsCol))
      .withColumn("__is_left", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val carryCols = rightCols.map(_ + suffix) :+ "__rts"
    // right rows sort before left rows at equal ts => `>=` semantics
    def carryBackward(d: DataFrame, colSuffix: String): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col(tsCol).asc, col("__is_left").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      carryCols.foldLeft(d)((acc, c) =>
        acc.withColumn(c + colSuffix, last(col(c), ignoreNulls = true).over(w)))
    }
    // left rows sort before right rows at equal ts; look ahead
    def carryForward(d: DataFrame, colSuffix: String): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col(tsCol).asc, col("__is_left").desc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      carryCols.foldLeft(d)((acc, c) =>
        acc.withColumn(c + colSuffix, first(col(c), ignoreNulls = true).over(w)))
    }
    val carried = direction match {
      case "backward" => carryBackward(unioned, "")
      case "forward"  => carryForward(unioned, "")
      case "nearest"  =>
        // both passes share the partitioning; per row pick the side with
        // the smaller gap (backward wins ties — pandas-compatible when
        // the backward match is at distance 0)
        val both = carryForward(carryBackward(unioned, "__b"), "__f")
        val gapB = col(tsCol) - col("__rts__b")
        val gapF = col("__rts__f") - col(tsCol)
        val chooseB = col("__rts__f").isNull ||
          (col("__rts__b").isNotNull && gapB <= gapF)
        carryCols.foldLeft(both)((acc, c) =>
            acc.withColumn(c, when(chooseB, col(c + "__b")).otherwise(col(c + "__f"))))
          .drop(carryCols.flatMap(c => Seq(c + "__b", c + "__f")): _*)
    }
    val gated = tolerance match {
      case Some(tol) =>
        val within = abs(col(tsCol) - col("__rts")) <= tol
        rightCols.map(_ + suffix).foldLeft(carried)((d, c) =>
          d.withColumn(c, when(within, col(c))))
      case None => carried
    }
    gated.filter(col("__is_left") === 1)
      .drop("__is_left", "__rts")
  }
}
