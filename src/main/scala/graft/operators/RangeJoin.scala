package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins — point-in-interval and interval-overlap — as BUCKETED
  * equi-joins. Absent from the reference (SQLite would nested-loop
  * them) and from Spark's equi-join planner: a bare
  * `p.ts BETWEEN i.lo AND i.hi` predicate with no equality conjunct
  * plans as BroadcastNestedLoopJoin — O(|points| × |intervals|)
  * comparisons, a non-starter at 100 TB.
  *
  * Per the custom-operator preference ladder this composes existing
  * operators: quantize the range dimension into fixed-width epoch
  * buckets, explode each interval to every bucket it overlaps, map each
  * point to its single bucket, equi-join on (keys…, bucket), then apply
  * the exact range predicate as a residual filter. The shuffle is an
  * ordinary hash partition on (keys…, bucket); comparisons drop from
  * |P|×|I| to sum-over-buckets |P_b|×|I_b|. For point-in-interval each
  * qualifying pair co-locates in EXACTLY one bucket (the point's), so no
  * dedup pass; interval-overlap pairs share every common bucket, so a
  * pair is emitted only from the bucket of `greatest(l.lo, r.lo)` —
  * dedup by arithmetic, not by a distinct shuffle.
  *
  * Picking `bucketWidth`: ~the TYPICAL interval length. Wider buckets
  * cut the interval explode factor but grow the per-bucket candidate
  * cross product; narrower buckets do the reverse. The explode factor is
  * `len/width + 1` per interval — bounded by `maxBucketsPerInterval`,
  * which fails LOUD (a distributed `raise_error`, not a silent truncate)
  * when one pathological interval would fan out past it: an interval
  * spanning the whole axis at a narrow width is a mis-chosen width, and
  * silently exploding it to millions of rows is the failure mode this
  * guard exists to catch. Skew note: all intervals crossing one hot
  * bucket hash to one task — AQE skew-join splitting applies because
  * this is a plain shuffled equi-join.
  *
  * Bounds are CLOSED on both ends ([lo, hi], SQL `BETWEEN`). Rows with a
  * NULL range value (point or either bound) never match, as in SQL.
  * Non-key column names must be disjoint between the two inputs.
  */
object RangeJoin {

  private def bucketOf(c: Column, width: Long): Column =
    floor(c / lit(width)).cast("long")

  /** End bucket of an interval, guarded: raise_error (distributed,
    * lazy-branch) rather than a silent mega-explode when one interval
    * spans more than `maxBuckets` buckets.
    */
  private def guardedEnd(b0: Column, b1: Column, maxBuckets: Int): Column =
    when(b1 - b0 >= lit(maxBuckets.toLong),
      raise_error(format_string(
        s"range-join interval spans %s buckets (max $maxBuckets): " +
          "widen bucketWidth or raise maxBucketsPerInterval",
        b1 - b0 + lit(1L))).cast("long"))
      .otherwise(b1)

  /** Point-in-interval join: every (point, interval) pair — matching on
    * `keys` when given — with `lo <= point.ts <= hi`. Inner join: points
    * covered by no interval drop out (anti-join the result's point ids
    * for the outer complement). Output columns: all point columns, then
    * all interval columns (keys once).
    *
    * @param tsCol    numeric point column on `points` (epoch seconds,
    *                 micros, a double — any one consistent unit)
    * @param startCol / endCol  numeric closed bounds on `intervals`,
    *                 same unit as `tsCol`
    * @param bucketWidth  bucket size in that unit, > 0
    */
  /** The working columns this join claims; colliding caller columns
    * would be silently overwritten, so fail loud instead.
    */
  private def requireNoInternalCols(dfs: DataFrame*): Unit =
    dfs.foreach(df => Seq("__rjb", "__b0", "__nb").foreach(c =>
      require(!df.columns.contains(c),
        s"range-join input already has a column named $c")))

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      bucketWidth: Long, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    requireNoInternalCols(points, intervals)
    val p = points.withColumn("__rjb", bucketOf(col(tsCol), bucketWidth))
    // an inverted interval (lo > hi) can match nothing, but sequence()
    // would happily explode it DESCENDING — drop before the explode
    val iv = intervals.where(col(startCol) <= col(endCol))
      .withColumn("__b0", bucketOf(col(startCol), bucketWidth))
      .withColumn("__rjb", explode(sequence(col("__b0"),
        guardedEnd(col("__b0"), bucketOf(col(endCol), bucketWidth),
          maxBucketsPerInterval))))
      .drop("__b0")
    p.join(iv, (keys :+ "__rjb").toSeq)
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__rjb")
  }

  /** Interval-overlap join: every (left, right) interval pair — matching
    * on `keys` when given — whose CLOSED ranges intersect:
    * `l.lo <= r.hi && r.lo <= l.hi`. Both sides explode to their bucket
    * spans; a pair shares every bucket their intersection covers, so it
    * is emitted only from the intersection's FIRST bucket
    * (`greatest(l.lo, r.lo)`'s) — exactly-once without a distinct.
    * Output: all left columns, then all right columns (keys once).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketWidth: Long, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    requireNoInternalCols(left, right)
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame =
      df.where(col(lo) <= col(hi)) // see pointInInterval: no desc explode
        .withColumn("__b0", bucketOf(col(lo), bucketWidth))
        .withColumn("__rjb", explode(sequence(col("__b0"),
          guardedEnd(col("__b0"), bucketOf(col(hi), bucketWidth),
            maxBucketsPerInterval))))
        .drop("__b0")
    exploded(left, lStart, lEnd)
      .join(exploded(right, rStart, rEnd), (keys :+ "__rjb").toSeq)
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__rjb") === bucketOf(greatest(col(lStart), col(rStart)),
          bucketWidth))
      .drop("__rjb")
  }
}
