package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("media table: binary payload + typed metadata, schema as declared") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    assert(media.schema("payload").dataType.typeName == "binary")
    val r = media.where(col("media_id") === 0).head
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getAs[Long]("n_bytes") > 0)
    assert(meta.getAs[Int]("width") >= 1 && meta.getAs[Int]("width") <= 64)
    assert(meta.getAs[Int]("height") >= 1)
  }

  test("PNG codec: real zlib roundtrip, CRC validated, corrupt rejected") {
    val codec = new Multimodal.PngCodec
    val data = "sample payload bytes for the real png codec round trip, " +
      "long enough to span several 64-pixel scanlines of the image." * 3
    val bytes = data.getBytes("UTF-8")
    val png = codec.encode(bytes)
    // real PNG signature + IHDR at the spec offsets
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h) = Multimodal.dims(bytes.length)
    val d = codec.decode(png)
    assert(d.width == w && d.height == h)
    assert(d.data.length == w * h)
    assert(java.util.Arrays.equals(d.data.take(bytes.length), bytes))
    assert(d.data.drop(bytes.length).forall(_ == 0), "padding pixels not zero")
    // flip a header byte -> CRC mismatch must be detected
    val corrupt = png.clone(); corrupt(17) = (corrupt(17) ^ 1).toByte
    intercept[IllegalArgumentException](codec.decode(corrupt))
    intercept[IllegalArgumentException](codec.decode(Array[Byte](1, 2, 3)))
    // empty payload still yields a valid 1x1 image
    val empty = codec.decode(codec.encode(Array.emptyByteArray))
    assert(empty.width == 1 && empty.height == 1 && empty.data.forall(_ == 0))
  }

  test("PNG decoder unfilters all five scanline filter types") {
    val codec = new Multimodal.PngCodec
    val w = 4; val h = 5
    val px = Array.tabulate(h, w)((r, c) => (r * 40 + c * 7) % 256)
    def left(r: Int, c: Int) = if (c > 0) px(r)(c - 1) else 0
    def up(r: Int, c: Int) = if (r > 0) px(r - 1)(c) else 0
    def ul(r: Int, c: Int) = if (r > 0 && c > 0) px(r - 1)(c - 1) else 0
    def paeth(a: Int, b: Int, cc: Int) = {
      val p = a + b - cc
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - cc))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc
    }
    // row r filtered with type r, per the PNG spec definitions
    val scan = new Array[Byte](h * (w + 1))
    for (r <- 0 until h) {
      scan(r * (w + 1)) = r.toByte
      for (c <- 0 until w) {
        val x = px(r)(c)
        val filtered = r match {
          case 0 => x
          case 1 => x - left(r, c)
          case 2 => x - up(r, c)
          case 3 => x - (left(r, c) + up(r, c)) / 2
          case 4 => x - paeth(left(r, c), up(r, c), ul(r, c))
        }
        scan(r * (w + 1) + 1 + c) = (filtered & 0xff).toByte
      }
    }
    val d = codec.decode(codec.encodeRaw(w, h, scan))
    assert(d.width == w && d.height == h)
    for (r <- 0 until h; c <- 0 until w)
      assert((d.data(r * w + c) & 0xff) == px(r)(c), s"pixel ($r,$c)")
  }

  test("PNG decoder rejects IDAT with surplus decompressed bytes") {
    // a corrupt stream whose deflate payload inflates to MORE than the
    // scanline buffer passes chunk CRC validation (the CRC covers the
    // compressed bytes) — the decoder must still quarantine it
    val codec = new Multimodal.PngCodec
    val w = 4; val h = 2
    val scan = new Array[Byte](h * (w + 1))
    val good = codec.encodeRaw(w, h, scan)
    // deflate (scanlines ++ 3 surplus bytes) and splice it in as the
    // IDAT of an otherwise-valid PNG (header reused, CRC recomputed)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(scan ++ Array[Byte](7, 7, 7)); deflater.finish()
    val zbuf = new Array[Byte](1024)
    val z = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) z.write(zbuf, 0, deflater.deflate(zbuf))
    deflater.end()
    val zdata = z.toByteArray
    def beInt(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tag = "IDAT".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(tag); crc.update(zdata)
    val bad = new java.io.ByteArrayOutputStream()
    bad.write(good, 0, 33) // SIG + IHDR chunk
    bad.write(beInt(zdata.length)); bad.write(tag); bad.write(zdata)
    bad.write(beInt(crc.getValue.toInt))
    bad.write(good, good.length - 12, 12) // IEND chunk
    intercept[IllegalArgumentException](codec.decode(bad.toByteArray))
    // sanity: the same splice with the exact scanline stream decodes
    assert(codec.decode(good).data.length == w * h)
  }

  test("nearest-neighbor resize: floor index mapping, hand-checked") {
    val codec = new Multimodal.PngCodec
    // 4x2 image, pixel value = index
    val d = Multimodal.Decoded(4, 2, Array.tabulate(8)(_.toByte))
    val t = codec.resizeNN(d, 2, 2)
    // out(r,c) = in((r*2)/2, (c*4)/2) = in(r, 2c) -> indices 0,2,4,6
    assert(t.map(_ & 0xff).toSeq == Seq(0, 2, 4, 6))
    val up = codec.resizeNN(d, 8, 4) // upsample: rows repeat
    assert(up.length == 32)
    assert((up(0) & 0xff) == 0 && (up(1) & 0xff) == 0 && (up(2) & 0xff) == 1)
  }

  test("decoded dimensions match the encoded metadata end-to-end") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir).limit(100))
    val joined = Multimodal.extractFeatures(media).toDF()
      .join(media.select(col("media_id"), col("meta")), "media_id")
    assert(joined.where(col("width") =!= col("meta.width") ||
      col("height") =!= col("meta.height") ||
      col("n_bytes") =!= col("meta.n_bytes")).count() == 0)
  }

  test("feature extraction: fixed dim, deterministic, no driver collect") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir).limit(50))
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 50)
    rows.foreach(r => assert(r.features.length == Multimodal.featureDim))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    rows.foreach(r => assert(again(r.media_id) == r.features.toSeq))
  }

  test("GVID container: validation, sampled decode replay, frame skipping") {
    val codec = new Multimodal.VideoCodec
    // 10 frames of known bytes -> stride 2 -> frames 0,2,4,6,8 sampled
    val frames = (0 until 10).map(f =>
      Array.tabulate[Byte](8)(i => ((f * 10 + i) % 256).toByte)).toArray
    val payload = codec.encode(frames, 4)
    val v = codec.decodeSampled(payload)
    assert(v.nFrames == 10 && v.fps == 4 && v.stride == 2)
    val wantSums = Seq(0, 2, 4, 6, 8).map(f =>
      frames(f).map(b => (b & 0xff).toLong).sum)
    assert(v.sampled.toSeq == wantSums)
    val wantMotion = wantSums.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum
    assert(v.motion == wantMotion)
    assert(v.f0Width == 8 && v.f0Height == 1)
    // corrupt magic rejected
    val bad = payload.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException](codec.decodeSampled(bad))
    // truncation rejected
    intercept[IllegalArgumentException](
      codec.decodeSampled(java.util.Arrays.copyOfRange(payload, 0, payload.length - 3)))
    // trailing garbage rejected
    intercept[IllegalArgumentException](codec.decodeSampled(payload :+ 0.toByte))
  }

  test("mm_video: Scala replay from text bytes over the real pipeline") {
    val docs = Tables.documents(spark, sfDir).limit(60)
    val got = Multimodal.videoSummary(Multimodal.videoFromDocuments(docs))
      .collect().map(r => r.media_id -> r).toMap
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .foreach { case (id, text) =>
        val bytes = text.getBytes("UTF-8").map(b => (b & 0xff).toLong)
        val nf = math.max(1, (bytes.length + 63) / 64)
        val stride = math.max(1, nf / 4)
        val sums = (0 until nf by stride).map(f =>
          bytes.slice(f * 64, f * 64 + 64).sum)
        val r = got(id)
        assert(r.n_frames == nf && r.kf_stride == stride)
        assert(r.n_sampled == sums.length.toLong)
        assert(r.sampled_sum == sums.sum)
        assert(r.motion == sums.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }.sum)
      }
  }

  test("phash pairs: chunk banding is lossless vs brute-force hamming; planted near-dups surface") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    val banded = Multimodal.phashPairs(media)
      .orderBy(col("media_a"), col("media_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // brute force over the hashes: every pair, exact hamming + the
    // brightness verify — the pigeonhole (hamming <= 3 over 4 x 16-bit
    // chunks forces one exact chunk match) makes the banded join
    // return EXACTLY this set, PROVIDED no bucket trips the occupancy
    // cap (asserted below, so the lossless claim is really tested)
    val h = Multimodal.avgHash(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    def degen(ph: Long): Boolean = {
      val bc = java.lang.Long.bitCount(ph)
      math.min(bc, 64 - bc) <= Multimodal.phashDegenerateBits
    }
    val brute = for {
      i <- h.indices; j <- (i + 1) until h.length
      d = java.lang.Long.bitCount(h(i)._2 ^ h(j)._2)
      if d <= 3 && (!(degen(h(i)._2) && degen(h(j)._2)) ||
        math.abs(h(i)._3 - h(j)._3) <= Multimodal.phashBrightnessTol)
    } yield (h(i)._1, h(j)._1, d)
    assert(banded.toSeq == brute.toSeq.sorted,
      s"banded candidates diverged from brute force: ${banded.length} vs ${brute.length}")
    val maxDf = h.flatMap { case (_, ph, _) =>
      (0 until 4).map(c => (c, (ph >>> (16 * c)) & 0xffffL)) }
      .groupBy(identity).values.map(_.length).max
    assert(maxDf <= Multimodal.phashBucketCap,
      s"corpus trips the occupancy cap ($maxDf) — lossless comparison void")
    // the documents table's planted near-dup texts become planted
    // near-dup images — the detector must actually find some
    assert(banded.nonEmpty, "no perceptual near-dups found in the corpus")
  }

  test("phash pairs: brightness-shifted structured dup caught; flat pair still brightness-gated") {
    import spark.implicits._
    // 512-byte texts in 8-char blocks so the 8x8 thumbnail samples one
    // byte per block: blocks alternate low/high -> a structured
    // 32-bit-set hash. B is A shifted +0x2E per byte (mean +46 > the
    // 32-level tolerance) with the SAME alternation -> identical bit
    // pattern, hamming 0: the canonical brightness-shifted near-dup
    // aHash is built to catch, which the r13 unconditional brightness
    // gate silently dropped
    def blocks(lo: Char, hi: Char): String =
      (0 until 64).map(j => (if (j % 2 == 0) lo else hi).toString * 8).mkString
    val structuredA = blocks(' ', '0')  // bytes 0x20/0x30, mean 0x28
    val structuredB = blocks('N', '^')  // bytes 0x4E/0x5E, mean 0x56
    val flatDark = "!" * 64             // hash 0 (degenerate)
    val flatLight = "a" * 64            // hash 0, mean +64 levels
    val media = Multimodal.mediaFromDocuments(Seq(
      1L -> structuredA, 2L -> structuredB, 3L -> flatDark, 4L -> flatLight
    ).toDF("doc_id", "text"))
    // fixture sanity: structured hashes identical and non-degenerate
    val h = Multimodal.avgHash(media).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h(1L)._1 == h(2L)._1 && java.lang.Long.bitCount(h(1L)._1) == 32,
      s"fixture drifted: ${h(1L)}, ${h(2L)}")
    assert(h(3L)._1 == 0L && h(4L)._1 == 0L)
    assert(math.abs(h(1L)._2 - h(2L)._2) > Multimodal.phashBrightnessTol)
    val ids = Multimodal.phashPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((1L, 2L)),
      "brightness-shifted structured near-dup lost — degenerate gate regressed")
    assert(!ids.contains((3L, 4L)),
      "flat images of different intensity must stay separated")
  }
}
