package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._
import graft.operators.{Audio, WavCodec}

/** The WAV codec is REAL: round-trips bit-exactly, is readable by the
  * JDK's independent javax.sound parser, and rejects corrupt
  * containers instead of zero-filling. */
class AudioSpec extends SparkSpec {

  private val codec = new WavCodec
  private val tone: Array[Short] =
    (0 until 100).map(i => (math.sin(i * 0.3) * 20000).toShort).toArray

  test("encode/decode round-trips samples and rate bit-exactly") {
    val d = codec.decode(codec.encode(tone, 8000))
    assert(d.sampleRate == 8000)
    assert(d.samples.toSeq == tone.toSeq)
    // empty clip is a legal zero-sample container
    val e = codec.decode(codec.encode(Array.empty[Short], 8000))
    assert(e.samples.isEmpty && e.sampleRate == 8000)
  }

  test("the JDK's javax.sound reader parses our container independently") {
    val wav = codec.encode(tone, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    assert(in.getFrameLength == tone.length.toLong)
    val pcm = in.readAllBytes()
    assert(pcm.length == tone.length * 2)
    // little-endian payload bytes match what we encoded
    assert(pcm.toSeq == codec.encode(tone, 8000).takeRight(pcm.length).toSeq)
  }

  test("corrupt containers are rejected; unknown chunks are skipped per RIFF") {
    val wav = codec.encode(tone, 8000)
    val badMagic = wav.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](codec.decode(badMagic))
    val truncated = wav.dropRight(10)
    intercept[IllegalArgumentException](codec.decode(truncated))
    // an extra unknown chunk after data is walked over, not an error
    val extra = wav ++ ("LIST".getBytes("US-ASCII") ++ Array[Byte](2, 0, 0, 0, 7, 9))
    assert(codec.decode(extra).samples.toSeq == tone.toSeq)
  }

  test("feature extraction matches hand-computed signal sums") {
    import spark.implicits._
    val s = Array[Short](100, -200, 0, -1, 5)
    val clips = Seq(graft.operators.AudioClip(42L, codec.encode(s, 8000), 0L)).toDS()
    val f = Audio.extractFeatures(clips).collect().head
    assert(f.n_samples == 5 && f.duration_us == 5L * 1000000 / 8000)
    assert(f.sum_abs == 100 + 200 + 0 + 1 + 5)
    assert(f.sum_sq == 100L * 100 + 200L * 200 + 1 + 25)
    // sign changes: 100→-200, -200→0, 0→-1, -1→5 = 4 (zero is non-negative)
    assert(f.zero_crossings == 4)
    assert(f.peak == 200)
  }

  test("documents → clips → features runs distributed and deterministically") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = Audio.extractFeatures(Audio.audioFromDocuments(docs)).toDF()
      .orderBy(col("media_id")).collect().map(_.toSeq)
    val b = Audio.extractFeatures(Audio.audioFromDocuments(docs.repartition(7))).toDF()
      .orderBy(col("media_id")).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }
}
