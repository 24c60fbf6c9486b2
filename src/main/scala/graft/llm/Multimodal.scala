package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.11): media payloads as
  * opaque `binary` columns plus typed metadata, with decode /
  * feature-extraction as partition-wise batch functions.
  *
  * The decode step itself is a STUB (this environment ships no
  * image/audio codecs): `decodeStub` derives deterministic fake
  * features from the raw bytes. Everything around it — the schema, the
  * binary payload column, the mapPartitions batching, the Encoder
  * plumbing — is the real Spark shape you'd use with a true codec: at
  * scale the decode is per-partition (amortizes codec init), stays off
  * the driver, and never widens the shuffle (features only, payload
  * dropped immediately after extraction).
  */
object Multimodal {

  /** One media record: payload bytes + typed metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (what survives past the decode stage). */
  final case class MediaFeatures(doc_id: Long, media_type: String,
      payload_len: Long, header_hex: String, n_chunks: Long)

  /** Build a media table from the documents table: UTF-8 payload bytes
    * standing in for image/audio blobs, with a typed metadata column.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** One sampled frame: which frame, where it starts, its bytes'
    * length, and a 4-byte header sniff.
    */
  final case class FrameSample(doc_id: Long, frame_idx: Long,
      frame_off: Long, frame_len: Long, frame_hex: String)

  /** Resize output: original vs downsampled payload size + header. */
  final case class ResizedMedia(doc_id: Long, orig_len: Long,
      resized_len: Long, head_hex: String)

  /** Deterministic frame sampling: cut the payload into `frameBytes`
    * frames, keep every `everyK`-th up to `maxFrames` — the video
    * frame-sample schedule (uniform stride, bounded per record so one
    * long video can't skew a partition). Real decoders replace the
    * byte-slice body; the flatMap-over-partitions shape, bounded
    * output and payload-drop-after-extract are the production shape.
    */
  def frameSample(spark: SparkSession, media: DataFrame, frameBytes: Int = 256,
      everyK: Int = 4, maxFrames: Int = 8): Dataset[FrameSample] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.flatMap { r =>
          val n = (r.payload.length + frameBytes - 1) / frameBytes
          (0 until n).filter(_ % everyK == 0).take(maxFrames).map { i =>
            val off = i.toLong * frameBytes
            val len = math.min(frameBytes.toLong, r.payload.length - off)
            val hex = r.payload.slice(off.toInt, off.toInt + math.min(4L, len).toInt)
              .map(b => f"${b & 0xff}%02X").mkString
            FrameSample(r.doc_id, i.toLong, off, len, hex)
          }
        }
      }
  }

  /** STUB resize: every `stride`-th byte survives — the downsample
    * shape (a real image resize replaces the body). Emits sizes + a
    * 4-byte header of the resized payload, payload itself dropped.
    */
  def resizeStub(spark: SparkSession, media: DataFrame,
      stride: Int = 4): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val resized = r.payload.indices.collect {
            case i if i % stride == 0 => r.payload(i)
          }
          val hex = resized.take(4).map(b => f"${b & 0xff}%02X").mkString
          ResizedMedia(r.doc_id, r.payload.length.toLong,
            resized.length.toLong, hex)
        }
      }
  }

  /** STUB decode: real codec calls would replace the body of the
    * per-record function; batching, schema and laziness are the real
    * thing. Features: payload length, hex of the first 4 bytes
    * ("magic number" sniff), 256-byte chunk count (frame-sample
    * stand-in).
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        // per-partition init would go here (codec handles, model weights)
        it.map { r =>
          val head = r.payload.take(4).map(b => f"${b & 0xff}%02X").mkString
          MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
            head, (r.payload.length + 255L) / 256L)
        }
      }
  }
}
