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
    * Scale shape: one bucket hash-agg; the grid is a TWO-LEVEL explode —
    * each series first explodes to coarse chunks of ≤ `chunkSteps` grid
    * points, then each chunk to its points — so no single row ever
    * materializes more than `chunkSteps` sequence elements (a multi-year
    * series at '1 minute' is ~10⁶ points; as one sequence() array that's
    * one multi-MB row and an OOM hazard, chunked it's ~128 bounded rows).
    * The forward fill is a window PARTITIONED BY SERIES (`last` with
    * ignoreNulls over the series' buckets in time order) — a global
    * unpartitioned window would funnel the whole table through one task
    * and is deliberately absent. Grids are per-series, so one long-lived
    * series doesn't pad every other series' range.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, step: String = "1 hour",
                    chunkSteps: Int = 8192): DataFrame = {
    require(chunkSteps > 0, s"chunkSteps must be positive, got $chunkSteps")
    val stepSec = stepSeconds(step)
    val buckets = df
      .groupBy(col(keyCol), bucketForStep(col(tsCol), step).as("bucket_ts"))
      .agg(count(lit(1)).as("n_events"), avg(col(valueCol)).as("avg_value"))
    // grid points as unix-second arithmetic (session TZ is pinned UTC, so
    // hour/day strides are fixed-length and match sequence-by-interval)
    val loS = unix_timestamp(col("lo"))
    val hiS = unix_timestamp(col("hi"))
    val chunkSpan = lit(stepSec * chunkSteps)
    val grid = buckets.groupBy(col(keyCol))
      .agg(min(col("bucket_ts")).as("lo"), max(col("bucket_ts")).as("hi"))
      .select(col(keyCol), loS.as("lo_s"), hiS.as("hi_s"),
        // integer chunk count: `/` on longs is DOUBLE division in Spark
        // SQL, so cast back (values are nonnegative: cast == floor)
        explode(sequence(lit(0L),
          ((hiS - loS) / chunkSpan).cast("long"))).as("chunk"))
      .select(col(keyCol),
        explode(sequence(
          col("lo_s") + col("chunk") * chunkSpan,
          least(col("lo_s") + (col("chunk") + 1) * chunkSpan - lit(stepSec),
            col("hi_s")),
          lit(stepSec))).as("sec"))
      .select(col(keyCol), timestamp_seconds(col("sec")).as("bucket_ts"))
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

  /** Fixed step length in seconds (valid under the pinned-UTC session —
    * no DST, so '1 day' is always 86400).
    */
  private def stepSeconds(step: String): Long =
    step.trim.toLowerCase.split("\\s+") match {
      case Array("1", "hour" | "hours")     => 3600L
      case Array("1", "day" | "days")       => 86400L
      case Array("1", "minute" | "minutes") => 60L
      case other => throw new IllegalArgumentException(
        s"unsupported resample step '${step}'")
    }
}
