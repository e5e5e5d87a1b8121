package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in per-partition batches.
  *
  * The Spark-side contract — schema, partitioning, batch shape, output
  * schema — is real and tested. The default codec calls are STUBBED with
  * a clearly-marked deterministic fake (`StubCodec`), because general
  * media libraries are not in this container; `ImageIoCodec` is a REAL
  * JDK-only implementation (javax.imageio images, RIFF/WAV audio) that
  * proves the `Codec` boundary composes — swap in a JNI/FFI-backed codec
  * (or run the same shapes as Pandas UDFs via mapInPandas from PySpark)
  * without touching any of the plumbing.
  */
object Multimodal {

  /** A media asset row: opaque bytes + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String,              // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int],
      duration_ms: Option[Long])

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long,
                   bytes: Array[Byte])

  /** A resampled audio chunk. `n_samples` is the real contract (samples at
    * `target_rate` covered by this chunk); `samples` holds the decoded PCM
    * — stubbed to a 4-float preview by StubCodec (codec libs absent), so
    * never assume `samples.length == n_samples` with the stub.
    */
  case class AudioChunk(media_id: Long, chunk_idx: Int, start_ms: Long,
                        n_samples: Int, samples: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** Codec contract: called once per batch (partition-iterator chunk) so a
    * real implementation can amortize model/codec init per batch — the
    * exact shape a `mapInPandas` Pandas UDF would have.
    *
    * `luminanceGrid` is the [[phash64]] input: a `grid`×`grid` map of
    * per-cell brightness in [0,1], row-major — the "tiny resized
    * grayscale image" every perceptual-hash pipeline starts from.
    */
  trait Codec extends Serializable {
    def decodeResizeExtract(batch: Seq[MediaRow], targetW: Int, targetH: Int): Seq[ImageFeatures]
    def sampleFrames(batch: Seq[MediaRow], everyMs: Long): Seq[Frame]
    def resampleAudio(batch: Seq[MediaRow], targetRate: Int, chunkMs: Long): Seq[AudioChunk]
    def luminanceGrid(batch: Seq[MediaRow], grid: Int): Seq[(Long, Array[Float])]
  }

  /** Modulus of the stub feature hash. Small enough that 31*acc + byte
    * never leaves the int53 range (in fact stays < 2^25), so the fold is
    * overflow-safe under ANSI arithmetic AND exactly restatable in any
    * engine's integer SQL — which is what makes `multimodal_features`
    * oracle-checkable end-to-end.
    */
  val HashMod = 1000003L

  /** STUB — deterministic fake standing in for the real decoder. Features
    * are a hash-derived vector of the bytes; frames are empty byte stubs at
    * the right timestamps. Replace with a real codec out of container.
    *
    * The hash is a per-step-modular polynomial fold over every
    * `max(1, len/64)`-th byte: acc' = (31*acc + byte) % HashMod. (A plain
    * wrapping-Long fold would be Java-specific — engines without
    * wraparound integer semantics, DuckDB included, cannot reproduce it.)
    */
  object StubCodec extends Codec {
    private def h(bytes: Array[Byte], salt: Int): Float = {
      var acc = java.lang.Math.floorMod(1125899906842597L + salt, HashMod)
      var i = 0
      val step = math.max(1, bytes.length / 64)
      while (i < bytes.length) {
        acc = (31L * acc + (bytes(i) & 0xff)) % HashMod
        i += step
      }
      acc.toFloat / HashMod.toFloat
    }
    def decodeResizeExtract(batch: Seq[MediaRow], targetW: Int, targetH: Int): Seq[ImageFeatures] =
      batch.map { r =>
        ImageFeatures(r.media_id, targetW, targetH,
          Array.tabulate(16)(i => h(r.bytes, i)))
      }
    def sampleFrames(batch: Seq[MediaRow], everyMs: Long): Seq[Frame] =
      batch.flatMap { r =>
        val dur = r.duration_ms.getOrElse(0L)
        (0L until dur by everyMs).zipWithIndex.map { case (ts, idx) =>
          Frame(r.media_id, idx, ts, Array(h(r.bytes, idx.toInt).toByte))
        }
      }
    def resampleAudio(batch: Seq[MediaRow], targetRate: Int, chunkMs: Long): Seq[AudioChunk] =
      batch.flatMap { r =>
        val dur = r.duration_ms.getOrElse(0L)
        (0L until dur by chunkMs).zipWithIndex.map { case (start, idx) =>
          val lenMs = math.min(chunkMs, dur - start)
          val n = (lenMs * targetRate / 1000L).toInt
          AudioChunk(r.media_id, idx, start, n,
            Array.tabulate(4)(j => h(r.bytes, idx * 4 + j)))
        }
      }
    // deterministic fake grid: per-cell hash of the payload. IDENTICAL
    // payloads get identical grids (hence identical pHashes, distance 0) —
    // the property the oracle-gated dedup query pins. Two deliberate
    // hardenings over the feature hash `h`: (1) the fold covers EVERY
    // byte — h's byte-SAMPLED fold collides on corpora with planted
    // repeat/extend near-duplicates (measured: 45 false dist-0 pairs on
    // the sf0.01 documents), faking "perceptual" matches the codec never
    // saw; (2) each cell passes through a murmur3-style avalanche
    // finalizer — a LINEAR per-cell mix (seed·31^len + P) would give
    // same-length docs with close polynomial values near-constant-shifted
    // grids, whose DCTs differ only in the DC bit. The per-cell full fold
    // is computed algebraically in O(len + cells), not O(len·cells):
    // fold(seed_i, bytes) = 31^len·seed_i + P over Z/2^64.
    def luminanceGrid(batch: Seq[MediaRow], grid: Int): Seq[(Long, Array[Float])] =
      batch.map { r =>
        var poly = 0L
        var pow = 1L
        var j = 0
        while (j < r.bytes.length) {
          poly = 31L * poly + (r.bytes(j) & 0xff) // wrapping Z/2^64
          pow = 31L * pow
          j += 1
        }
        val cells = Array.tabulate(grid * grid) { i =>
          var z = pow * (1125899906842597L + i) + poly
          z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
          z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
          z ^= z >>> 33
          (z >>> 11).toFloat / (1L << 53).toFloat // [0, 1)
        }
        r.media_id -> cells
      }
  }

  /** REAL pure-JVM codec for the formats the JDK itself can decode —
    * images via `javax.imageio` (PNG/JPEG/BMP/GIF), audio via a built-in
    * RIFF/WAV PCM16 parser with linear-interpolation resampling. This is
    * the proof that the [[Codec]] boundary composes with a non-stub
    * implementation (MultimodalSpec drives it through the same
    * `imageFeatures`/`audioChunks` plumbing as the stub, unchanged).
    * [[StubCodec]] stays the default because general media (mp4/webm/…)
    * needs FFI codecs that are absent from this container; video
    * sampling is therefore honestly unsupported here.
    *
    * Image features: mean gray level per cell of a 4×4 grid over the
    * bilinear-resized image — 16 floats in [0,1], a classic tiny visual
    * descriptor that is exact on solid colors and monotone on gradients.
    */
  object ImageIoCodec extends Codec {
    def decodeResizeExtract(batch: Seq[MediaRow], targetW: Int,
                            targetH: Int): Seq[ImageFeatures] =
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        require(img != null, s"media_id ${r.media_id}: not a JDK-decodable image")
        val resized = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = resized.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val feats = new Array[Float](16)
        var cy = 0
        while (cy < 4) {
          var cx = 0
          while (cx < 4) {
            var acc = 0L; var n = 0
            var y = cy * targetH / 4
            while (y < (cy + 1) * targetH / 4) {
              var x = cx * targetW / 4
              while (x < (cx + 1) * targetW / 4) {
                val rgb = resized.getRGB(x, y)
                acc += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                n += 1; x += 1
              }
              y += 1
            }
            feats(cy * 4 + cx) =
              if (n == 0) 0f else (acc.toDouble / (n * 3 * 255.0)).toFloat
            cx += 1
          }
          cy += 1
        }
        ImageFeatures(r.media_id, targetW, targetH, feats)
      }

    def sampleFrames(batch: Seq[MediaRow], everyMs: Long): Seq[Frame] =
      throw new UnsupportedOperationException(
        "video containers need an FFI codec (ffmpeg et al.), which the JDK " +
          "does not provide — use StubCodec or supply a custom Codec")

    def resampleAudio(batch: Seq[MediaRow], targetRate: Int,
                      chunkMs: Long): Seq[AudioChunk] =
      batch.flatMap { r =>
        val (srcRate, pcm) = parseWavPcm16Mono(r.bytes)
        val outLen = (pcm.length.toLong * targetRate / srcRate).toInt
        val out = new Array[Float](outLen)
        var i = 0
        while (i < outLen) {
          val pos = i.toDouble * srcRate / targetRate
          val i0 = pos.toInt; val frac = pos - i0
          val a = pcm(i0).toDouble
          val b = (if (i0 + 1 < pcm.length) pcm(i0 + 1) else pcm(i0)).toDouble
          out(i) = ((a + (b - a) * frac) / 32768.0).toFloat
          i += 1
        }
        val perChunk = (chunkMs * targetRate / 1000L).toInt
        require(perChunk > 0,
          s"chunkMs=$chunkMs at targetRate=$targetRate yields an empty chunk")
        out.grouped(perChunk).zipWithIndex.map { case (chunk, idx) =>
          AudioChunk(r.media_id, idx, idx.toLong * chunkMs, chunk.length, chunk)
        }.toSeq
      }

    /** Real luminance grid: bilinear-resize to `grid`×`grid` and take the
      * mean-RGB gray of each pixel — the standard pHash front end.
      */
    def luminanceGrid(batch: Seq[MediaRow], grid: Int): Seq[(Long, Array[Float])] =
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
        require(img != null, s"media_id ${r.media_id}: not a JDK-decodable image")
        val resized = new java.awt.image.BufferedImage(
          grid, grid, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = resized.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, grid, grid, null)
        } finally g.dispose()
        val cells = new Array[Float](grid * grid)
        var y = 0
        while (y < grid) {
          var x = 0
          while (x < grid) {
            val rgb = resized.getRGB(x, y)
            cells(y * grid + x) =
              ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff))
                / (3.0 * 255.0)).toFloat
            x += 1
          }
          y += 1
        }
        r.media_id -> cells
      }

    /** Minimal RIFF/WAVE walker: PCM (format 1), mono, 16-bit only. */
    private def parseWavPcm16Mono(bytes: Array[Byte]): (Int, Array[Short]) = {
      def le32(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
      def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      require(bytes.length > 44 && new String(bytes, 0, 4) == "RIFF" &&
        new String(bytes, 8, 4) == "WAVE", "not a RIFF/WAVE payload")
      var off = 12; var rate = -1; var dataOff = -1; var dataLen = -1
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4); val sz = le32(off + 4)
        // declared sizes are untrusted input: a negative size would stall
        // the walk (off += 0) and an over-stated one would read past the
        // buffer — bound both against the real payload
        require(sz >= 0 && off + 8 + sz <= bytes.length,
          s"corrupt WAV: chunk '$id' declares $sz bytes at offset $off " +
            s"in a ${bytes.length}-byte payload")
        if (id == "fmt ") {
          // the fmt fields read below live at off+8..off+23: a declared
          // fmt size under 16 would pass the generic bound above yet read
          // past the chunk (and possibly the buffer when fmt is last)
          require(sz >= 16, s"corrupt WAV: fmt chunk declares $sz bytes (< 16)")
          require(le16(off + 8) == 1, "only PCM wav supported")
          require(le16(off + 10) == 1, "only mono wav supported")
          rate = le32(off + 12)
          require(le16(off + 22) == 16, "only 16-bit wav supported")
        } else if (id == "data") { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(rate > 0 && dataOff > 0, "missing fmt or data chunk")
      val n = dataLen / 2
      val pcm = new Array[Short](n)
      var i = 0
      while (i < n) { pcm(i) = le16(dataOff + 2 * i).toShort; i += 1 }
      (rate, pcm)
    }
  }

  private val BatchSize = 64

  /** Decode + resize + feature-extract images, batched per partition.
    * Narrow map stage: no shuffle; partition count controls codec
    * parallelism. Repartition upstream by size if assets are skewed.
    */
  def imageFeatures(media: Dataset[MediaRow], targetW: Int = 224, targetH: Int = 224,
                    codec: Codec = StubCodec): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      it.grouped(BatchSize).flatMap(b => codec.decodeResizeExtract(b.toSeq, targetW, targetH))
    }
  }

  /** Sample frames from videos every `everyMs` ms (UDTF/flatMap shape). */
  def videoFrames(media: Dataset[MediaRow], everyMs: Long = 1000L,
                  codec: Codec = StubCodec): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").mapPartitions { it =>
      it.grouped(BatchSize).flatMap(b => codec.sampleFrames(b.toSeq, everyMs))
    }
  }

  /** Resample audio to `targetRate` Hz in `chunkMs`-long chunks — the
    * standard pre-tokenization shape for speech models (fixed-length
    * windows of normalized-rate PCM). Same batched narrow-map contract as
    * the other codec paths; chunk boundaries and sample counts are pure
    * metadata arithmetic (oracle-checkable), only the PCM itself is
    * codec-dependent.
    */
  def audioChunks(media: Dataset[MediaRow], targetRate: Int = 8000,
                  chunkMs: Long = 5000L,
                  codec: Codec = StubCodec): Dataset[AudioChunk] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio").mapPartitions { it =>
      it.grouped(BatchSize).flatMap(b => codec.resampleAudio(b.toSeq, targetRate, chunkMs))
    }
  }

  /** 64-bit perceptual hash (pHash): luminance grid → 2D DCT-II → the
    * 8×8 low-frequency band → bit b = 1 iff coefficient b exceeds the
    * band's median. Visually similar images differ in few bits (hamming
    * distance), identical payloads in none — the image member of the
    * near-dup family: feed the output straight into
    * [[Dedup.hammingPairsFromSigs]] (the SimHash pigeonhole machinery,
    * reused verbatim) for bucketed candidate generation; never all-pairs.
    *
    * Same batched narrow-map contract as the other codec paths — no
    * shuffle; the DCT is O(64·grid²) per image, trivial next to decode.
    */
  def phash64(media: Dataset[MediaRow], grid: Int = 16,
              codec: Codec = StubCodec): DataFrame = {
    require(grid >= 8, s"pHash needs an >= 8x8 luminance grid, got $grid")
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      it.grouped(BatchSize).flatMap { b =>
        codec.luminanceGrid(b.toSeq, grid).map { case (id, cells) =>
          id -> phashOfGrid(cells, grid)
        }
      }
    }.toDF("media_id", "phash")
  }

  /** The hash core, exposed for spec-level parity checks: 8×8 low-band
    * 2D DCT-II over a row-major `grid`×`grid` cell array, median
    * thresholded into 64 bits.
    */
  private[graft] def phashOfGrid(cells: Array[Float], grid: Int): Long = {
    val n = grid
    val band = 8
    val coefs = new Array[Double](band * band)
    var u = 0
    while (u < band) {
      var v = 0
      while (v < band) {
        var acc = 0.0
        var y = 0
        while (y < n) {
          val cy = math.cos(math.Pi * (2 * y + 1) * u / (2.0 * n))
          var x = 0
          while (x < n) {
            acc += cells(y * n + x) * cy *
              math.cos(math.Pi * (2 * x + 1) * v / (2.0 * n))
            x += 1
          }
          y += 1
        }
        coefs(u * band + v) = acc
        v += 1
      }
      u += 1
    }
    // median threshold over the 64 low-band coefficients (DC included —
    // it lands on one side of the median like any other coefficient and
    // keeps the hash exactly 64 bits)
    val sorted = coefs.clone().sorted
    val median = (sorted(31) + sorted(32)) / 2.0
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (coefs(i) > median) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Build a MediaRow dataset from any table with an id and a payload-ish
    * string column (the container has no real media files; tests and
    * benchmarks fabricate deterministic bytes from existing columns).
    */
  def synthesize(spark: SparkSession, df: DataFrame, idCol: String,
                 payloadCol: String, kind: String = "image"): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        encode(col(payloadCol), "UTF-8").as("bytes"),
        lit(64).as("width"), lit(64).as("height"),
        (if (kind == "audio") lit(16000) else lit(null).cast("int")).as("sample_rate"),
        (length(col(payloadCol)).cast("long") * 100L).as("duration_ms"))
      .as[MediaRow]
  }
}
