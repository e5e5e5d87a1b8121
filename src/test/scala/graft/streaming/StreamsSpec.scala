package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("windowed streaming agg equals the batch equivalent") {
    val streamed = Streams.windowedEventCounts(spark,
      "/root/testdata/sf0.001/events.parquet", queryName = "t_stream_eq")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("flatMapGroupsWithState sessionization closes sessions by event-time gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val sessions = Streams.sessionize(input.toDS(), gapMs = 5000L)
    val q = sessions.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("t_sessions")
      .start()
    try {
      input.addData(
        Streams.Event(1L, new Timestamp(1000L), 10L, "click", 1.0),
        Streams.Event(2L, new Timestamp(2000L), 10L, "click", 2.0),
        Streams.Event(3L, new Timestamp(3000L), 20L, "view", 5.0))
      q.processAllAvailable()
      // watermark is still behind every timeout: nothing emitted yet
      assert(spark.table("t_sessions").count() == 0)
      // advance the watermark far past both sessions' timeout timestamps
      input.addData(Streams.Event(4L, new Timestamp(20000L), 30L, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("t_sessions").as[Streams.Session].collect()
        .map(s => s.user_id -> s).toMap
      assert(out.contains(10L) && out.contains(20L))
      assert(out(10L).n_events == 2 && math.abs(out(10L).total_value - 3.0) < 1e-9)
      assert(out(20L).n_events == 1)
      assert(!out.contains(30L)) // still open
      assert(out.values.forall(_.closed_by_timeout))
    } finally q.stop()
  }

  test("batch sessionization splits on event-time gaps") {
    import spark.implicits._
    val events = Seq(
      (1L, new Timestamp(0L), 1L, "a", 1.0),
      (2L, new Timestamp(1000L * 60), 1L, "a", 2.0),        // same session
      (3L, new Timestamp(1000L * 60 * 60 * 3), 1L, "a", 4.0), // 3h gap -> new
      (4L, new Timestamp(0L), 2L, "b", 8.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Streams.sessionizeBatch(events, gapMs = 3600000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got((1L, 1L)) == ((2L, 3.0)))
    assert(got((1L, 2L)) == ((1L, 4.0)))
    assert(got((2L, 1L)) == ((1L, 8.0)))
  }
}
