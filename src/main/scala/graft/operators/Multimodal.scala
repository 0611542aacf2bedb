package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus partition-wise decode/feature
  * plumbing.
  *
  * The Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; the actual codec calls are STUBBED with deterministic
  * fakes — media libraries are not available in this container, and the
  * engine must not depend on them. Swap [[MediaCodec]] for a real codec
  * (JNI/FFI) without touching the dataflow.
  *
  * Scale notes: media bytes never pass through a shuffle here — decode
  * and feature extraction are narrow `mapPartitions` over the scan, so
  * the plan reads bytes, emits small feature rows, and only the features
  * move. Partition sizing for 100 TB of media is governed by
  * `spark.sql.files.maxPartitionBytes`, not row counts.
  */
object Multimodal {

  /** One media asset: opaque payload + typed envelope. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      mime: String,
      source: String)

  /** Decoded-asset metadata (what a real decoder would emit). */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      width: Option[Int], // images/video
      height: Option[Int],
      sample_rate: Option[Int], // audio
      n_frames: Option[Int]) // video/audio frames

  /** The codec seam. Every method is a deterministic fake over the raw
    * bytes (STUB — replace with real decoders); signatures and batch
    * iteration are the real contract.
    */
  object MediaCodec {
    /** Cheap rolling checksum standing in for content decode. */
    def checksum(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L // prime
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }

    /** STUB decode: derives plausible dimensions from the checksum
      * instead of parsing a real container format.
      */
    def decode(r: MediaRecord): MediaMeta = {
      val c = checksum(r.bytes)
      val pos = c & Long.MaxValue // nonneg; math.abs(Long.MinValue) is negative
      r.kind match {
        case "image" => MediaMeta(r.media_id, r.kind, r.bytes.length.toLong, c,
          Some((pos % 1920 + 64).toInt), Some((pos % 1080 + 64).toInt),
          None, None)
        case "audio" => MediaMeta(r.media_id, r.kind, r.bytes.length.toLong, c,
          None, None, Some(Seq(16000, 22050, 44100)((pos % 3).toInt)),
          Some((pos % 10000).toInt))
        case _ => MediaMeta(r.media_id, r.kind, r.bytes.length.toLong, c,
          Some((pos % 1920 + 64).toInt), Some((pos % 1080 + 64).toInt),
          None, Some((pos % 86400).toInt))
      }
    }

    /** STUB feature extractor: 8-dim deterministic embedding of the
      * payload (a real one would run a vision/audio model per batch).
      */
    def features(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val c = checksum(bytes)
      Array.tabulate(dim)(i =>
        (((c >>> (i * 8)) & 0xFF).toFloat / 255.0f) * 2f - 1f)
    }
  }

  /** Decode a media table partition-wise: binary in, metadata out. The
    * batch shape (iterator over records within a partition) is exactly
    * what a real vectorized decoder needs — amortize model/codec init
    * once per partition, stream records through.
    */
  def decodeMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: init codec once here, reuse across the partition
      it.map(MediaCodec.decode)
    }
  }

  /** Feature extraction: (media_id, embedding) per asset, ready for
    * [[Similarity]] ANN ops downstream.
    */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 8): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map(r => (r.media_id, MediaCodec.features(r.bytes, dim)))
    }.toDF("media_id", "embedding")
  }

  /** Resize plumbing: payload→payload map with target dimensions carried
    * in the envelope mime. STUB transform (a real impl decodes, scales,
    * re-encodes per batch); the dataflow contract — narrow partition-wise
    * map, bytes never shuffled — is the real part.
    */
  def resize(ds: Dataset[MediaRecord], width: Int, height: Int)
      : Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: init scaler once per partition
      it.map { r =>
        val n = math.max(1, math.min(r.bytes.length, width * height / 256))
        r.copy(bytes = r.bytes.take(n),
          mime = s"${r.mime};w=$width;h=$height")
      }
    }
  }

  /** Frame sampling plumbing for video/audio: emit every `stride`-th
    * frame index up to the decoded frame count — demonstrates the 1→N
    * explode shape (flatMap) a real frame sampler uses.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame = {
    import meta.sparkSession.implicits._
    meta.flatMap { m =>
      val n = m.n_frames.getOrElse(0)
      (0 until n by math.max(1, stride)).map(f => (m.media_id, f))
    }.toDF("media_id", "frame_index")
  }

  /** Wrap a text/binary-bearing DataFrame into the media envelope —
    * used by tests and the oracle query to build media rows from the
    * harness `documents` table deterministically.
    */
  def fromBinaryColumn(df: DataFrame, idCol: String, binCol: String,
      kind: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        col(binCol).cast("binary").as("bytes"),
        lit(s"application/x-$kind").as("mime"),
        lit("harness").as("source"))
      .as[MediaRecord]
  }
}
