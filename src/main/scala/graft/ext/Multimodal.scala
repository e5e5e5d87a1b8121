package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in per-partition batches.
  *
  * The Spark-side contract — schema, partitioning, batch shape, output
  * schema — is real and tested. The actual codec calls are STUBBED with a
  * clearly-marked deterministic fake (`StubCodec`), because media
  * libraries are not in this container: swap `Codec` for a JNI/FFI-backed
  * implementation (or run the same shapes as Pandas UDFs via mapInPandas
  * from PySpark) without touching any of the plumbing.
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
    */
  trait Codec extends Serializable {
    def decodeResizeExtract(batch: Seq[MediaRow], targetW: Int, targetH: Int): Seq[ImageFeatures]
    def sampleFrames(batch: Seq[MediaRow], everyMs: Long): Seq[Frame]
    def resampleAudio(batch: Seq[MediaRow], targetRate: Int, chunkMs: Long): Seq[AudioChunk]
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
