package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling over event tables: regularize an irregular
  * event stream onto a fixed grid (per series), filling gaps by carrying
  * the last observation forward — the pandas `resample().ffill()` /
  * QuestDB `SAMPLE BY ... FILL(PREV)` shape, expressed relationally.
  */
object TimeSeries {

  /** Resample `df` to a regular `step` grid per `keyCol` series:
    * bucket-aggregate `valueCol` (avg), then LEFT-join the per-series
    * min→max grid and forward-fill empty buckets with the last seen
    * aggregate. Returns (keyCol, bucket_ts, n_events, avg_value,
    * filled_value).
    *
    * Scale shape: one bucket hash-agg; the grid explode is one row per
    * series (sequence() on the per-series bounds — never a driver loop);
    * the forward fill is a window PARTITIONED BY SERIES (`last` with
    * ignoreNulls over the series' buckets in time order) — a global
    * unpartitioned window would funnel the whole table through one task
    * and is deliberately absent. Grids are per-series, so one long-lived
    * series doesn't pad every other series' range.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, step: String = "1 hour"): DataFrame = {
    val stepI = expr(s"INTERVAL $step")
    val buckets = df
      .groupBy(col(keyCol), bucketForStep(col(tsCol), step).as("bucket_ts"))
      .agg(count(lit(1)).as("n_events"), avg(col(valueCol)).as("avg_value"))
    val grid = buckets.groupBy(col(keyCol))
      .agg(min(col("bucket_ts")).as("lo"), max(col("bucket_ts")).as("hi"))
      .select(col(keyCol), explode(sequence(col("lo"), col("hi"), stepI))
        .as("bucket_ts"))
    val w = Window.partitionBy(keyCol).orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(buckets, Seq(keyCol, "bucket_ts"), "left")
      .select(col(keyCol), col("bucket_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("avg_value"),
        last(col("avg_value"), ignoreNulls = true).over(w).as("filled_value"))
  }

  /** Truncate a timestamp to the grid for a step expressed as an SQL
    * interval of ONE unit ("1 hour", "1 day"). Multi-count steps
    * ("2 hours") are rejected: the bucketing truncates by UNIT while the
    * grid strides by the full interval, so a count ≠ 1 would silently
    * drop every bucket that falls off the stride (use a unit grid and
    * re-aggregate for coarser steps).
    */
  private def bucketForStep(ts: Column, step: String): Column =
    step.trim.toLowerCase.split("\\s+") match {
      case Array("1", "hour" | "hours")     => date_trunc("hour", ts)
      case Array("1", "day" | "days")       => date_trunc("day", ts)
      case Array("1", "minute" | "minutes") => date_trunc("minute", ts)
      case other => throw new IllegalArgumentException(
        s"unsupported resample step '${step}' — use '1 hour', '1 day' or " +
          "'1 minute' (multi-count strides would silently skip buckets)")
    }
}
