package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:30:00")

  test("resample+ffill: grid complete, gaps carried forward, per-series bounds") {
    val events = Seq(
      ("a", ts(1), 10.0), ("a", ts(1), 20.0),  // hour 1: avg 15
      ("a", ts(4), 40.0),                      // hours 2,3 are gaps
      ("b", ts(2), 7.0)                        // series b: single bucket
    ).toDF("k", "ts", "v")
    val got = TimeSeries.resampleFfill(events, "k", "ts", "v", "1 hour")
      .orderBy("k", "bucket_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13),
        r.getLong(2), Option(r.get(3)).map(_.toString), r.getDouble(4)))
    assert(got.length == 5, s"a spans 4 hourly buckets, b spans 1: ${got.toSeq}")
    assert(got(0) == (("a", "01", 2L, Some("15.0"), 15.0)))
    assert(got(1) == (("a", "02", 0L, None, 15.0)), "gap carries hour 1's avg")
    assert(got(2) == (("a", "03", 0L, None, 15.0)))
    assert(got(3) == (("a", "04", 1L, Some("40.0"), 40.0)))
    assert(got(4) == (("b", "02", 1L, Some("7.0"), 7.0)),
      "series b's grid starts at ITS min, not the global one")
  }

  test("resample: multi-year 1-minute series completes with bounded chunk rows") {
    // 3 years at 1-minute steps ≈ 1.58M grid points for ONE series — as a
    // single sequence() array that's one ~12 MB row; chunked (8192/chunk)
    // it's ~193 bounded rows pre-explode. Two events pin the bounds.
    val events = Seq(
      ("long", Timestamp.valueOf("2023-01-01 00:00:30"), 1.0),
      ("long", Timestamp.valueOf("2026-01-01 00:00:30"), 2.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.resampleFfill(events, "k", "ts", "v", "1 minute")
    val expectedPoints = (3 * 365L + 366L - 365L) * 24 * 60 + 1  // 2024 is a leap year
    assert(out.count() == expectedPoints, "full grid, no chunk seam gaps")
    // chunk seams are exact: no duplicate and no missing minute anywhere
    val seams = out.groupBy("bucket_ts").count().filter(col("count") > 1).count()
    assert(seams == 0, "no bucket duplicated at chunk boundaries")
    val filled = out.filter(col("n_events") === 0).count()
    assert(filled == expectedPoints - 2, "all interior points gap-filled")
  }

  test("resample rejects unsupported step units") {
    val df = Seq(("a", ts(1), 1.0)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.resampleFfill(df, "k", "ts", "v", "1 fortnight")
    }
  }
}
