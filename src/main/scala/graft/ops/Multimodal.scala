package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north star): image/audio/video as
  * opaque `binary` payloads with typed metadata, processed in
  * partition-sized batches.
  *
  * The real decode step needs codec libraries absent from this build,
  * so `decodeStub` is a clearly-marked deterministic fake that parses
  * the 8-byte GRFT header; everything around it — schema, typed
  * Dataset batching via mapPartitions (the Scala analogue of
  * mapInPandas batch processing), partition-preserving feature
  * extraction, downstream reuse of features in the Similarity ops —
  * is real and tested.
  *
  * Scale: every op here is map-only (no shuffle); payload bytes never
  * leave their partition. Feature vectors are small (16 floats) so the
  * expensive column is scanned once and dropped before any wide op.
  */
object Multimodal {

  /** Typed media row: payload + metadata (kind/meta model the sidecar
    * columns a real ingest would carry). */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMeta(media_id: Long, kind: String, width: Int, height: Int,
      format: String, n_bytes: Int)
  case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Synthesize a media table from the documents corpus: payload =
    * 8-byte fake header (magic "GRFT", width, height big-endian
    * shorts) + utf-8 text bytes. Deterministic — the test corpus for
    * the binary pipeline. */
  def synthesize(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"), col("lang")).as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val body = text.getBytes("UTF-8")
        val w = (id % 640 + 16).toInt; val h = (id % 480 + 16).toInt
        val header = Array[Byte]('G', 'R', 'F', 'T',
          (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte)
        MediaRow(id, if (lang == "zh") "image" else "audio", header ++ body)
      }
  }

  /** STUB DECODER — stands in for a real codec (libjpeg/ffmpeg not in
    * this container). Parses the deterministic GRFT header only. The
    * mapPartitions batch shape (iterator-in/iterator-out, one codec
    * context per partition) is exactly what a real decoder plugs into. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: allocate one decoder context here, reuse per row
      rows.map { r =>
        val p = r.payload
        require(p.length >= 8 && p(0) == 'G' && p(1) == 'R' && p(2) == 'F' && p(3) == 'T',
          s"bad magic for media ${r.media_id}")
        val w = ((p(4) & 0xff) << 8) | (p(5) & 0xff)
        val h = ((p(6) & 0xff) << 8) | (p(7) & 0xff)
        DecodedMeta(r.media_id, r.kind, w, h, "grft", p.length)
      }
    }
  }

  /** Real (non-stub) feature extraction: 16-bin byte histogram of the
    * payload body, L1-normalized — a deterministic stand-in embedding
    * that feeds the Similarity ops unchanged. */
  def byteHistogram(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val hist = new Array[Float](16)
        var i = 8 // skip header
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xff) >> 4) += 1f
          i += 1
        }
        val n = math.max(1, r.payload.length - 8).toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        MediaFeatures(r.media_id, hist)
      }
    }
  }

  /** STUB resize — a real implementation decodes, scales, re-encodes;
    * the deterministic fake rewrites the header dims and truncates the
    * body proportionally (keeps the plumbing — payload in, payload
    * out, map-only — honest). */
  def resizeStub(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val body = r.payload.drop(8)
      val keep = math.max(1, body.length / 2)
      val header = Array[Byte]('G', 'R', 'F', 'T',
        (newW >> 8).toByte, newW.toByte, (newH >> 8).toByte, newH.toByte)
      r.copy(payload = header ++ body.take(keep))
    }
  }

  /** Frame sampling for "video" payloads: every k-th 16-byte chunk of
    * the body as one frame row (explode shape — one input row → many
    * frame rows, the generator pattern a real video pipeline uses). */
  case class Frame(media_id: Long, frame_no: Int, bytes: Array[Byte])
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val body = r.payload.drop(8)
      body.grouped(16).zipWithIndex.collect {
        case (chunk, idx) if idx % everyK == 0 => Frame(r.media_id, idx, chunk)
      }
    }
  }
}
