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
    assert(meta.getAs[Int]("width") >= 64 && meta.getAs[Int]("height") >= 48)
  }

  test("PNG codec: real header roundtrip, CRC validated, corrupt rejected") {
    val codec = new Multimodal.PngCodec
    val data = "sample payload bytes".getBytes("UTF-8")
    val png = codec.encode(321, 123, data)
    // real PNG signature + big-endian IHDR dims at the spec offsets
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    assert(png.length == 57 + data.length)
    val d = codec.decode(png)
    assert(d.width == 321 && d.height == 123)
    assert(java.util.Arrays.equals(d.data, data))
    // flip a header byte -> CRC mismatch must be detected
    val corrupt = png.clone(); corrupt(17) = (corrupt(17) ^ 1).toByte
    intercept[IllegalArgumentException](codec.decode(corrupt))
    intercept[IllegalArgumentException](codec.decode(Array[Byte](1, 2, 3)))
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
}
