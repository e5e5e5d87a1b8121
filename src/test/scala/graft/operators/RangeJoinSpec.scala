package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic pseudo-random fixture (no Random: reproducible)
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))

  private lazy val points: DataFrame = {
    val r = lcg(7L)
    (1 to 300).map { i =>
      (i.toLong, math.floorMod(r.next(), 10000L), math.floorMod(r.next(), 3L))
    }.toDF("pid", "ts", "k")
  }
  private lazy val intervals: DataFrame = {
    val r = lcg(13L)
    (1 to 120).map { i =>
      val lo = math.floorMod(r.next(), 9500L)
      (i.toLong, lo, lo + math.floorMod(r.next(), 900L), math.floorMod(r.next(), 3L))
    }.toDF("iid", "lo", "hi", "k")
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("point-in-interval matches the brute-force cross join, keyless") {
    for (width <- Seq(50L, 400L, 20000L)) {
      val got = pairsOf(RangeJoin.pointInInterval(
        points.drop("k"), intervals.drop("k"), "ts", "lo", "hi", width))
      val want = pairsOf(points.drop("k").crossJoin(intervals.drop("k"))
        .where(col("ts") >= col("lo") && col("ts") <= col("hi")))
      assert(got == want, s"width=$width")
      assert(want.nonEmpty)
    }
  }

  test("point-in-interval matches the brute-force join, keyed") {
    val got = pairsOf(RangeJoin.pointInInterval(
      points, intervals.withColumnRenamed("k", "k2"),
      "ts", "lo", "hi", bucketWidth = 300L, keys = Nil)
      .where(col("k") === col("k2")))
    val keyed = pairsOf(RangeJoin.pointInInterval(
      points, intervals, "ts", "lo", "hi", bucketWidth = 300L,
      keys = Seq("k")))
    assert(keyed == got)
    assert(keyed.nonEmpty && keyed.size < got.size + 1)
  }

  test("closed bounds: ts == lo and ts == hi both match; outside misses") {
    val p = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)).toDF("pid", "ts")
    val iv = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = pairsOf(RangeJoin.pointInInterval(p, iv, "ts", "lo", "hi", 7L))
    assert(got == Set((1L, 1L), (2L, 1L)))
  }

  test("multi-bucket intervals match each point exactly once") {
    val p = Seq((1L, 500L)).toDF("pid", "ts")
    val iv = Seq((1L, 0L, 1000L)).toDF("iid", "lo", "hi") // spans 101 buckets
    val rows = RangeJoin.pointInInterval(p, iv, "ts", "lo", "hi", 10L).count()
    assert(rows == 1L)
  }

  test("null range values and inverted intervals never match") {
    val p = Seq((1L, Some(10L)), (2L, None)).toDF("pid", "ts")
    val iv = Seq((1L, Some(0L), Some(100L)), (2L, None, Some(100L)),
      (3L, Some(90L), Some(5L))).toDF("iid", "lo", "hi")
    val got = pairsOf(RangeJoin.pointInInterval(p, iv, "ts", "lo", "hi", 10L))
    assert(got == Set((1L, 1L)))
  }

  test("explode guard fails loud on a pathological interval, not silently") {
    val p = Seq((1L, 5L)).toDF("pid", "ts")
    val iv = Seq((1L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(p, iv, "ts", "lo", "hi", 1L,
        maxBucketsPerInterval = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("range-join interval")))
  }

  test("interval-overlap matches brute force, each pair exactly once") {
    val r = lcg(99L)
    val left = (1 to 80).map { i =>
      val lo = math.floorMod(r.next(), 5000L)
      (i.toLong, lo, lo + math.floorMod(r.next(), 1200L))
    }.toDF("pid", "l_lo", "l_hi")
    val right = (1 to 90).map { i =>
      val lo = math.floorMod(r.next(), 5000L)
      (i.toLong, lo, lo + math.floorMod(r.next(), 700L))
    }.toDF("iid", "r_lo", "r_hi")
    for (width <- Seq(100L, 1000L)) {
      val gotDf = RangeJoin.intervalOverlap(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", width)
      val got = gotDf.select("pid", "iid").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      val want = pairsOf(left.crossJoin(right)
        .where(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi")))
      assert(got.length == got.toSet.size, s"duplicate pairs at width=$width")
      assert(got.toSet == want, s"width=$width")
      assert(want.nonEmpty)
    }
  }

  test("interval-overlap keyed matches the keyless result filtered by key") {
    val left = Seq((1L, 0L, 50L, "a"), (2L, 0L, 50L, "b"))
      .toDF("pid", "l_lo", "l_hi", "k")
    val right = Seq((1L, 10L, 20L, "a"), (2L, 10L, 20L, "b"))
      .toDF("iid", "r_lo", "r_hi", "k")
    val got = pairsOf(RangeJoin.intervalOverlap(
      left, right, "l_lo", "l_hi", "r_lo", "r_hi", 25L, keys = Seq("k")))
    assert(got == Set((1L, 1L), (2L, 2L)))
  }

  test("plan is a shuffled equi-join — no nested-loop, no cartesian") {
    val plan = RangeJoin.pointInInterval(
      points.drop("k"), intervals.drop("k"), "ts", "lo", "hi", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
