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

  /** Decoded raster features (what a real image-decode stage keeps:
    * dimensions, channels, exact integer luma so the gate hash is
    * bit-stable — mean luma is `luma_sum / (n_pixels * 1000.0)`).
    */
  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      channels: Int, maxval: Int, n_pixels: Long, luma_sum: Long)

  /** Pure-JVM binary-PPM (P6) decode: header = "P6", then width,
    * height, maxval as ASCII ints separated by whitespace, with
    * `#`-to-newline comments allowed between tokens, a single
    * whitespace after maxval, then width·height packed RGB bytes.
    * No codec library needed — PPM is the uncompressed interchange
    * format, which is exactly why it's the one real decoder this
    * container can have. Returns None for anything that isn't a
    * complete 8-bit P6 stream (truncated pixels, maxval > 255, other
    * magic) so opaque formats fall through to [[decodeStub]].
    *
    * Luma is the integer ITU-R BT.601 weighting: per pixel
    * 299·R + 587·G + 114·B (milli-units, exact in Long).
    */
  /** P6 header parse shared by [[decodePpm]] and [[ppmDHash]]:
    * returns (width, height, maxval, pixel-data offset) for a complete
    * 8-bit binary PPM, None otherwise (same validity contract as
    * [[decodePpm]]'s Scaladoc).
    */
  private def parsePpmHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    var pos = 2
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    def skipWsAndComments(): Boolean = {
      var progressed = true
      while (progressed && pos < bytes.length) {
        progressed = false
        while (pos < bytes.length && isWs(bytes(pos))) { pos += 1; progressed = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          progressed = true
        }
      }
      pos < bytes.length
    }
    def readInt(): Option[Int] = {
      if (!skipWsAndComments()) return None
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); any = true; pos += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly ONE whitespace byte separates the header from pixels
      if pos < bytes.length && isWs(bytes(pos))
      _ = { pos += 1 }
      nPix = w.toLong * h
      if bytes.length - pos >= nPix * 3
    } yield (w, h, maxval, pos)
  }

  def decodePpm(bytes: Array[Byte]): Option[ImageFeatures] = {
    parsePpmHeader(bytes).map { case (w, h, maxval, pos) =>
      val nPix = w.toLong * h
      var luma = 0L
      var i = pos
      val end = pos + (nPix * 3).toInt
      while (i < end) {
        luma += 299L * (bytes(i) & 0xff) + 587L * (bytes(i + 1) & 0xff) +
          114L * (bytes(i + 2) & 0xff)
        i += 3
      }
      ImageFeatures(0L, w, h, 3, maxval, nPix, luma)
    }
  }

  /** Perceptual difference hash (dHash — Krawetz's gradient hash, the
    * standard cheap near-duplicate image fingerprint) of a P6 PPM:
    * nearest-neighbor sample the image onto an 8-row × 9-column luma
    * grid (grid cell (r, c) reads the pixel at row ⌊r·h/8⌋, column
    * ⌊c·w/9⌋ — integer-exact, no resampling filter, so every engine
    * replays it bit-for-bit), then bit r·8+c of the 64-bit hash is set
    * iff luma(r, c) > luma(r, c+1). Luma is the integer BT.601
    * milli-weighting (299·R + 587·G + 114·B) — same as [[decodePpm]].
    * Bits combine with OR, so bit 63 (two's-complement sign) is safe.
    */
  def ppmDHash(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    parsePpmHeader(bytes).map { case (w, h, _, pos) =>
      def lumaAt(rr: Int, cc: Int): Long = {
        val p = pos + 3 * (rr * w + cc)
        299L * (bytes(p) & 0xff) + 587L * (bytes(p + 1) & 0xff) +
          114L * (bytes(p + 2) & 0xff)
      }
      var hash = 0L
      var r = 0
      while (r < 8) {
        val rr = r * h / 8
        var c = 0
        while (c < 8) {
          val l0 = lumaAt(rr, c * w / 9)
          val l1 = lumaAt(rr, (c + 1) * w / 9)
          if (l0 > l1) hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      (w, h, hash)
    }

  /** Per-image dHash row (drops undecodable payloads — the
    * [[decodeImages]] two-path contract). */
  final case class ImageHashRow(doc_id: Long, width: Int, height: Int,
      dhash: Long)

  /** Distributed dHash over a media table: partition-wise decode+hash,
    * payload dropped immediately — only (id, dims, 8-byte hash)
    * survive toward the pairing shuffle.
    */
  def imageDHashes(spark: SparkSession, media: DataFrame): Dataset[ImageHashRow] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.flatMap { r =>
          ppmDHash(r.payload).map { case (w, h, hsh) =>
            ImageHashRow(r.doc_id, w, h, hsh)
          }
        }
      }
  }

  /** Real image decode over a media table: PPM payloads parse to
    * raster features; opaque payloads are dropped here (route them to
    * [[decodeStub]] — the two-path split a production pipeline uses).
    * Same scale shape as the stub: partition-wise, payload never
    * survives the stage, nothing widens a shuffle.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRecord]
      .mapPartitions { it =>
        it.flatMap(r => decodePpm(r.payload).map(_.copy(doc_id = r.doc_id)))
      }
  }

  /** Deterministic synthetic P6 image per doc: width/height cycle with
    * doc_id, every third doc carries a header comment (exercises the
    * parser's comment skip), pixel byte p = (doc_id·31 + 7p) mod 256 —
    * a formula the DuckDB oracle replays WITHOUT parsing PPM, so the
    * gate cross-checks writer and parser against independent math.
    */
  def syntheticPpmTable(docs: DataFrame): DataFrame = {
    val gen = udf { (docId: Long) =>
      val w = 4 + (docId % 5).toInt
      val h = 3 + (docId % 4).toInt
      val header =
        if (docId % 3 == 0) s"P6\n# synthetic $docId\n$w $h\n255\n"
        else s"P6\n$w $h\n255\n"
      val px = Array.tabulate(w * h * 3)(p => ((docId * 31 + 7L * p) % 256).toByte)
      header.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ px
    }
    docs.select(col("doc_id"),
      lit("image/x-portable-pixmap").as("media_type"),
      gen(col("doc_id")).as("payload"))
  }
}
