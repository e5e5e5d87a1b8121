package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("media synthesis + image feature extraction plumbing") {
    val media = Multimodal.synthesize(spark, docs.limit(100), "doc_id", "text")
    val feats = Multimodal.imageFeatures(media, targetW = 32, targetH = 32)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(r => r.width == 32 && r.height == 32))
    // deterministic: same input -> same features
    val again = Multimodal.imageFeatures(media, targetW = 32, targetH = 32).collect()
    assert(rows.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
  }

  test("video frame sampling emits frames at requested cadence") {
    val media = Multimodal.synthesize(spark, docs.limit(10), "doc_id", "text",
      kind = "video")
    val frames = Multimodal.videoFrames(media, everyMs = 5000L)
    val byId = frames.collect().groupBy(_.media_id)
    assert(byId.nonEmpty)
    for ((_, fs) <- byId) {
      val idxs = fs.map(_.frame_idx).sorted.toSeq
      assert(idxs == (0 until fs.length))
      assert(fs.forall(f => f.ts_ms == f.frame_idx * 5000L))
    }
  }

  test("kind filter: images don't produce frames") {
    val media = Multimodal.synthesize(spark, docs.limit(5), "doc_id", "text")
    assert(Multimodal.videoFrames(media).count() == 0)
  }
}
