package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

final case class WavData(sampleRate: Int, samples: Array[Short])
final case class AudioClip(media_id: Long, payload: Array[Byte], n_bytes: Long)
final case class AudioFeatures(media_id: Long, n_samples: Long, duration_us: Long,
    sum_abs: Long, sum_sq: Long, zero_crossings: Long, peak: Int)

/** Real RIFF/PCM WAV container codec (the audio counterpart of
  * [[PngCodec]]): canonical 44-byte header — RIFF size, `fmt ` chunk
  * (PCM, mono, 16-bit little-endian), `data` chunk — produced on
  * encode; decode does the full format walk: RIFF/WAVE magic check,
  * chunk iteration with odd-size padding, fmt validation
  * (PCM/mono/16-bit), data-size bounds check against the buffer
  * (truncated payloads are rejected, not zero-filled). Any standard
  * WAV reader opens the output — AudioSpec cross-validates against the
  * JDK's javax.sound reader. */
class WavCodec {

  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("US-ASCII")); le32(out, 36 + dataSize)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(out, 16)
    le16(out, 1)               // PCM
    le16(out, 1)               // mono
    le32(out, sampleRate)
    le32(out, sampleRate * 2)  // byte rate
    le16(out, 2)               // block align
    le16(out, 16)              // bits per sample
    out.write("data".getBytes("US-ASCII")); le32(out, dataSize)
    var i = 0
    while (i < samples.length) { le16(out, samples(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def decode(bytes: Array[Byte]): WavData = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      s"not a RIFF/WAVE container (${bytes.length} bytes)")
    var off = 12
    var rate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      val body = off + 8
      require(body + size <= bytes.length,
        s"truncated $id chunk: $size bytes declared, ${bytes.length - body} present")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          require(u16(bytes, body) == 1, "only PCM is supported")
          require(u16(bytes, body + 2) == 1, "only mono is supported")
          require(u16(bytes, body + 14) == 16, "only 16-bit is supported")
          rate = u32(bytes, body + 4).toInt
        case "data" =>
          require(size % 2 == 0, s"odd PCM data size: $size")
          val n = (size / 2).toInt
          val s = new Array[Short](n)
          var i = 0
          while (i < n) { s(i) = u16(bytes, body + 2 * i).toShort; i += 1 }
          samples = s
        case _ => () // unknown chunks are skipped, per RIFF
      }
      off = body + size.toInt + (size.toInt & 1) // odd chunks pad 1 byte
    }
    require(rate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    WavData(rate, samples)
  }
}

/** Audio-column plumbing (the audio leg of SURVEY §2 #35/#65):
  * deterministic PCM clips synthesized from `documents` text bytes
  * (sample_i = (byte_i − 128) · 256, int16), encoded as REAL WAV
  * containers, then decoded back for feature extraction — signal-level
  * quality gates (energy, zero-crossing rate, peak) are what an audio
  * training-data pipeline filters on. All features are exact integer
  * sums over the decoded samples, so the DuckDB oracle replays them
  * from the same text bytes without a WAV parser (the codec round-trip
  * itself is spec-pinned against the JDK's reader). mapPartitions with
  * per-partition codec init, case-class encoders — same scale shape as
  * the PNG path. */
object Audio {

  val sampleRate = 8000

  def samplesOf(data: Array[Byte]): Array[Short] = {
    val s = new Array[Short](data.length)
    var i = 0
    while (i < data.length) { s(i) = (((data(i) & 0xff) - 128) * 256).toShort; i += 1 }
    s
  }

  /** (media_id, payload WAV bytes, n_bytes) from the documents table. */
  def audioFromDocuments(docs: DataFrame): Dataset[AudioClip] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val codec = new WavCodec
        rows.map { case (docId, text) =>
          val payload = codec.encode(
            samplesOf(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
            sampleRate)
          AudioClip(docId, payload, payload.length.toLong)
        }
      }
  }

  /** Decode + signal features: Σ|s|, Σs², strict sign-change count
    * (zero counts as non-negative), max |s|, duration in µs
    * (n · 10⁶ div rate — integer). */
  def extractFeatures(clips: Dataset[AudioClip]): Dataset[AudioFeatures] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions { rows =>
      val codec = new WavCodec
      rows.map { c =>
        val d = codec.decode(c.payload)
        val s = d.samples
        var sumAbs = 0L; var sumSq = 0L; var zc = 0L; var peak = 0
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          val a = math.abs(v)
          sumAbs += a; sumSq += v.toLong * v
          if (a > peak) peak = a
          if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        AudioFeatures(c.media_id, s.length.toLong,
          s.length.toLong * 1000000L / d.sampleRate,
          sumAbs, sumSq, zc, peak)
      }
    }
  }
}
