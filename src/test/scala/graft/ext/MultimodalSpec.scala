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
    assert(Multimodal.audioChunks(media).count() == 0)
  }

  test("audio resample chunking: grid covers the duration at the target rate") {
    val media = Multimodal.synthesize(spark, docs.limit(20), "doc_id", "text",
      kind = "audio")
    val durations = media.collect().map(r => r.media_id -> r.duration_ms.get).toMap
    val chunks = Multimodal.audioChunks(media, targetRate = 8000, chunkMs = 5000L)
      .collect().groupBy(_.media_id)
    assert(chunks.keySet == durations.filter(_._2 > 0).keySet)
    for ((id, cs) <- chunks) {
      val dur = durations(id)
      val sorted = cs.sortBy(_.chunk_idx)
      assert(sorted.map(_.chunk_idx).toSeq == (0 until cs.length))
      assert(sorted.forall(c => c.start_ms == c.chunk_idx * 5000L))
      // total samples == duration at 8 kHz (8 samples per ms)
      assert(sorted.map(_.n_samples.toLong).sum == dur * 8)
      // all chunks full except possibly the last
      assert(sorted.dropRight(1).forall(_.n_samples == 40000))
    }
  }
}
