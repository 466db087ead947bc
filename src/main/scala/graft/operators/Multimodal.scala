package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 #35).
  *
  * Images/audio/video ride through Spark as opaque `binary` columns
  * with a typed metadata struct. Payloads here are REAL PNG containers:
  * an 8-byte signature, an IHDR chunk holding big-endian width/height
  * with a correct CRC-32, a data chunk carrying the sample bytes, and
  * IEND. The decode kernel does honest format work — it validates the
  * signature, parses IHDR dimensions, and checks the IHDR CRC before
  * touching the data. The one declared stub is compression: the data
  * chunk stores raw bytes where a real encoder would zlib-compress
  * scanlines (this container has no image codec libs), so the chunk is
  * tagged "grFT" (a private ancillary chunk id, as the PNG spec
  * prescribes for application data) rather than a fake IDAT.
  *
  * Scale notes: feature extraction is `Dataset.mapPartitions` with a
  * case-class encoder — per-partition codec init, streaming iterator,
  * no driver collect, no RDD round-trip (Tungsten row format in and
  * out). Metadata-only queries prune the binary column at the scan.
  */
object Multimodal {

  val featureDim = 8

  /** (media_id, media_type, payload, meta{n_bytes,width,height}) —
    * deterministic media synthesized from `documents`: text bytes stand
    * in for the encoded samples, wrapped in a real PNG container. */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val codec = new PngCodec
        rows.map { case (docId, text) =>
          val w = (docId % 640 + 64).toInt
          val h = (docId % 480 + 48).toInt
          val payload = codec.encode(w, h,
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val mt = (docId % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          Media(docId, mt, payload, Meta(payload.length.toLong, w, h))
        }
      }
      .toDF()
  }

  /** Decode + feature extraction: parse the PNG header (real format
    * work), then an 8-bin value-weighted byte histogram over the sample
    * bytes. Integer accumulation end-to-end; the fixed-point features
    * are floor((acc * 1e6) / n) so any engine reproduces them exactly. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init — where a real decoder or feature
        // model would be constructed once per task
        val codec = new PngCodec
        rows.map { case (id, mt, payload) =>
          val d = codec.decode(payload)
          MediaFeatures(id, mt, payload.length.toLong, d.width, d.height,
            codec.features(d.data, featureDim))
        }
      }
  }

  /** Query surface: decoded dimensions + fixed-point feature mass;
    * binary column pruned away. feature_mass = sum of the integer
    * fixed-point features / 1e6 (order-free integer sum → engine-stable
    * double), rounded to 6 places. */
  def featureSummary(media: DataFrame): DataFrame =
    extractFeatures(media).toDF()
      .select(col("media_id"), col("media_type"), col("n_bytes"),
        col("width"), col("height"),
        round(aggregate(col("features"), lit(0L), (a, x) => a + x)
          .cast("double") / 1e6, 6).as("feature_mass"))

  final case class Meta(n_bytes: Long, width: Int, height: Int)
  final case class Media(media_id: Long, media_type: String,
      payload: Array[Byte], meta: Meta)
  final case class MediaFeatures(media_id: Long, media_type: String,
      n_bytes: Long, width: Int, height: Int, features: Array[Long])
  final case class Decoded(width: Int, height: Int, data: Array[Byte])

  /** Minimal PNG container codec. Header handling is real (signature,
    * IHDR layout, CRC-32); sample compression is the declared stub —
    * raw bytes in a private "grFT" chunk instead of zlib'd IDAT. */
  final class PngCodec extends Serializable {
    private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    private val crc = new java.util.zip.CRC32

    private def beInt(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    private def readBeInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(12 + data.length)
      out.write(beInt(data.length))
      val tagBytes = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tagBytes)
      out.write(data)
      crc.reset(); crc.update(tagBytes); crc.update(data)
      out.write(beInt(crc.getValue.toInt))
      out.toByteArray
    }

    /** signature + IHDR(w, h, 8-bit grayscale) + grFT(data) + IEND. */
    def encode(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
      val ihdr = new Array[Byte](13)
      System.arraycopy(beInt(width), 0, ihdr, 0, 4)
      System.arraycopy(beInt(height), 0, ihdr, 4, 4)
      ihdr(8) = 8 // bit depth
      ihdr(9) = 0 // color type: grayscale
      val out = new java.io.ByteArrayOutputStream(57 + data.length)
      out.write(SIG)
      out.write(chunk("IHDR", ihdr))
      out.write(chunk("grFT", data))
      out.write(chunk("IEND", Array.emptyByteArray))
      out.toByteArray
    }

    /** Validate signature + IHDR CRC, parse dimensions, return the
      * sample bytes. Throws on a corrupt container (callers quarantine,
      * mirroring the poison-pill rule). */
    def decode(payload: Array[Byte]): Decoded = {
      require(payload.length >= 57, s"truncated PNG: ${payload.length} bytes")
      var i = 0
      while (i < 8) {
        require(payload(i) == SIG(i), s"bad PNG signature at byte $i")
        i += 1
      }
      val ihdrLen = readBeInt(payload, 8)
      require(ihdrLen == 13, s"bad IHDR length $ihdrLen")
      crc.reset(); crc.update(payload, 12, 4 + ihdrLen)
      require(crc.getValue.toInt == readBeInt(payload, 16 + ihdrLen), "IHDR CRC mismatch")
      val width = readBeInt(payload, 16)
      val height = readBeInt(payload, 20)
      val dataLen = readBeInt(payload, 33)
      val data = java.util.Arrays.copyOfRange(payload, 41, 41 + dataLen)
      Decoded(width, height, data)
    }

    /** 8-bin value-weighted byte histogram, fixed-point (×1e6 / n,
      * floored): integer in, integer out — engine-reproducible. */
    def features(data: Array[Byte], dim: Int): Array[Long] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < data.length) {
        val b = data(i) & 0xff
        acc(b % dim) += b.toLong
        i += 1
      }
      val n = math.max(data.length, 1).toLong
      val out = new Array[Long](dim)
      var j = 0
      while (j < dim) {
        out(j) = math.floor(acc(j).toDouble * 1e6 / n).toLong
        j += 1
      }
      out
    }
  }
}
