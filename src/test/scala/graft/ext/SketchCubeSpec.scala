package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The incremental HLL sketch cube: batch-split invariance, lossless
  * merge compaction, and versioned time travel over cube states.
  */
class SketchCubeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newCube(): String =
    graft.Caches.newTempDir("sketchcube_spec").toString + "/cube"

  // 600 rows, 3 keys, deterministic overlapping user sets; the key is
  // decorrelated from event_id mod 3 (the batch-split residue below)
  // so every batch carries every key
  private lazy val events = (0 until 600).map { i =>
    (i.toLong, s"t${(i / 7) % 3}", (i * 7 % 97).toLong)
  }.toDF("event_id", "event_type", "user_id")

  // hll_sketch_estimate returns BIGINT
  private def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("batch split is invisible: 3-batch cube == single-shot sketch, exactly") {
    val cube = newCube()
    (0 until 3).foreach { r =>
      SketchCube.appendBatch(events.filter(pmod($"event_id", lit(3)) === r),
        Seq("event_type"), "user_id", cube)
    }
    val cubed = estimates(SketchCube.distinct(spark, cube, Seq("event_type")))
    val oneShot = estimates(events.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
        .as("n_approx")))
    // HLL union is lossless in register space: identical registers,
    // identical estimate — not merely within tolerance
    assert(cubed == oneShot && cubed.nonEmpty)
    // and the estimate is actually close to the exact distinct count
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cubed.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)) <= math.max(1L, exact(k) / 20),
        s"$k: est $est vs exact ${exact(k)}")
    }
  }

  test("merge folds to one row per key without moving any estimate") {
    val cube = newCube()
    (0 until 3).foreach { r =>
      SketchCube.appendBatch(events.filter(pmod($"event_id", lit(3)) === r),
        Seq("event_type"), "user_id", cube)
    }
    val before = estimates(SketchCube.distinct(spark, cube, Seq("event_type")))
    SketchCube.merge(spark, cube, Seq("event_type"))
    assert(estimates(SketchCube.distinct(spark, cube, Seq("event_type")))
      == before)
    assert(graft.catalog.VersionedTable.read(spark, cube).count() == 3,
      "merged cube should hold exactly one sketch row per key")
  }

  test("streaming ingest: the cube equals the batch-built cube after the drain") {
    val src = graft.Caches.newTempDir("sketchcube_stream_src").toString
    events.repartition(3).write.mode("overwrite").parquet(src)
    val cube = newCube()
    val ckpt = graft.Caches.newTempDir("sketchcube_stream_ckpt").toString
    graft.streaming.Streams.streamSketchCube(spark, src, cube, ckpt,
      Seq("event_type"), "user_id")
    val streamed = estimates(SketchCube.distinct(spark, cube, Seq("event_type")))
    val oneShot = estimates(events.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
        .as("n_approx")))
    assert(streamed == oneShot)
    // checkpointed rerun replays nothing: version ladder unchanged
    val n = graft.catalog.VersionedTable.versions(spark, cube).size
    graft.streaming.Streams.streamSketchCube(spark, src, cube, ckpt,
      Seq("event_type"), "user_id")
    assert(graft.catalog.VersionedTable.versions(spark, cube).size == n)
  }

  test("time travel asks 'distinct as of version N'") {
    val cube = newCube()
    val b0 = events.filter(pmod($"event_id", lit(3)) === 0)
    SketchCube.appendBatch(b0, Seq("event_type"), "user_id", cube)
    SketchCube.appendBatch(events.filter(pmod($"event_id", lit(3)) =!= 0),
      Seq("event_type"), "user_id", cube)
    val asOfV0 = estimates(
      SketchCube.distinct(spark, cube, Seq("event_type"), version = 0))
    val b0Only = estimates(b0.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
        .as("n_approx")))
    assert(asOfV0 == b0Only)
    // latest covers everything b0 did not
    val latest = estimates(SketchCube.distinct(spark, cube, Seq("event_type")))
    assert(latest.forall { case (k, v) => v >= asOfV0.getOrElse(k, 0L) })
  }
}
