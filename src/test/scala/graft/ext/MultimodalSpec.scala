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

  test("ImageIoCodec: REAL PNG decode through the unchanged plumbing") {
    import spark.implicits._
    // two real PNGs: a solid color (features exactly predictable — PNG is
    // lossless and averaging a constant is the constant) and a left-to-
    // right gradient (features monotone per grid row)
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val solid = (100 << 16) | (150 << 8) | 200
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png(64, 48, (_, _) => solid),
        Some(64), Some(48), None, None),
      Multimodal.MediaRow(2L, "image",
        png(64, 48, (x, _) => { val v = x * 255 / 63; (v << 16) | (v << 8) | v }),
        Some(64), Some(48), None, None)
    ).toDS()

    // the exact same imageFeatures entry point as the stub — only the
    // codec argument differs (the swap the trait boundary promises)
    val feats = Multimodal.imageFeatures(media, targetW = 16, targetH = 16,
      codec = Multimodal.ImageIoCodec).collect().map(f => f.media_id -> f).toMap

    val f1 = feats(1L)
    assert(f1.width == 16 && f1.height == 16 && f1.features.length == 16)
    val expected = (100 + 150 + 200) / (3 * 255.0)
    f1.features.foreach(v => assert(math.abs(v - expected) < 1e-3,
      s"solid-color feature $v != $expected"))
    val f2 = feats(2L)
    for (row <- 0 until 4) {
      val cells = (0 until 4).map(c => f2.features(row * 4 + c))
      assert(cells == cells.sorted, s"gradient row $row not monotone: $cells")
      assert(cells.last - cells.head > 0.3, s"gradient too flat: $cells")
    }
  }

  test("pHash: identical payloads hash identically; perceptual closeness with a real codec") {
    import spark.implicits._
    def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gray(v: Int) = { val c = math.max(0, math.min(255, v)); (c << 16) | (c << 8) | c }
    // a frequency-RICH smooth image (several incommensurate sinusoids):
    // its low-band DCT coefficients are well spread, so the median
    // threshold is robust to small perturbations. (A flat linear gradient
    // would put ~all AC coefficients at 0 and the sign bits would be
    // numerical noise — the degenerate case real photos don't hit.)
    def scene(x: Int, y: Int): Int =
      (128 + 50 * math.sin(x * 0.35) + 40 * math.sin(y * 0.27)
        + 25 * math.sin((x + 2 * y) * 0.11) + 15 * math.sin((3 * x - y) * 0.07)).toInt
    val base = png(64, 64, (x, y) => gray(scene(x, y)))
    // the same scene with a small local perturbation: perceptually the
    // same picture, byte-wise a different file
    val perturbed = png(64, 64, (x, y) =>
      gray(scene(x, y) + (if (x < 6 && y < 6) 30 else 0)))
    val checker = png(64, 64, (x, y) => if (((x / 8) + (y / 8)) % 2 == 0) gray(255) else gray(0))
    val media = Seq(
      Multimodal.MediaRow(1L, "image", base, Some(64), Some(64), None, None),
      Multimodal.MediaRow(2L, "image", base.clone(), Some(64), Some(64), None, None),
      Multimodal.MediaRow(3L, "image", perturbed, Some(64), Some(64), None, None),
      Multimodal.MediaRow(4L, "image", checker, Some(64), Some(64), None, None)
    ).toDS()
    val hashes = Multimodal.phash64(media, codec = Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    assert(dist(1L, 2L) == 0, "byte-identical payloads must hash identically")
    assert(dist(1L, 3L) <= 8,
      s"perceptually-near images must be hamming-near, got ${dist(1L, 3L)}")
    assert(dist(1L, 4L) > 16,
      s"structurally different images must be hamming-far, got ${dist(1L, 4L)}")

    // stub codec: determinism + the dedup composition end-to-end (the
    // pigeonhole machinery shared with SimHash finds the planted twin)
    val docs = Seq(
      (1L, "payload alpha shared by the planted twin"),
      (2L, "payload alpha shared by the planted twin"),
      (3L, "a completely different third payload")).toDF("doc_id", "text")
    val sMedia = Multimodal.synthesize(spark, docs, "doc_id", "text")
    val sigs = Multimodal.phash64(sMedia)
      .select(col("media_id").as("doc_id"), col("phash").as("sig"))
    val pairs = graft.ext.Dedup.hammingPairsFromSigs(sigs, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)), s"planted twin at distance 0 only: $pairs")
  }

  test("ImageIoCodec: REAL WAV parse + resample through audioChunks") {
    import spark.implicits._
    // a real RIFF/WAVE PCM16 mono payload: 16 kHz, 12000-sample ramp
    val srcRate = 16000; val n = 12000
    def wav(): Array[Byte] = {
      val dataLen = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(1)            // PCM, mono
      bb.putInt(srcRate); bb.putInt(srcRate * 2) // byte rate
      bb.putShort(2); bb.putShort(16)           // block align, bits
      bb.put("data".getBytes); bb.putInt(dataLen)
      for (i <- 0 until n) bb.putShort((i % 3200).toShort)
      bb.array()
    }
    val media = Seq(Multimodal.MediaRow(7L, "audio", wav(),
      None, None, Some(srcRate), Some(n * 1000L / srcRate))).toDS()

    val chunks = Multimodal.audioChunks(media, targetRate = 8000,
        chunkMs = 250L, codec = Multimodal.ImageIoCodec)
      .collect().sortBy(_.chunk_idx)
    // 12000 samples @16k = 750 ms -> 6000 samples @8k -> 3 chunks of 2000
    assert(chunks.length == 3)
    assert(chunks.map(_.n_samples).toSeq == Seq(2000, 2000, 2000))
    assert(chunks.map(_.start_ms).toSeq == Seq(0L, 250L, 500L))
    // real codec contract: the PCM really is there, n_samples long
    assert(chunks.forall(c => c.samples.length == c.n_samples))
    // 2:1 decimation of a ramp: sample i at 8 kHz == source sample 2i
    val all = chunks.flatMap(_.samples)
    for (i <- Seq(0, 1, 100, 1599, 1601, 5999))
      assert(math.abs(all(i) - ((2 * i) % 3200) / 32768.0f) < 1e-4,
        s"resampled sample $i off: ${all(i)}")
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
