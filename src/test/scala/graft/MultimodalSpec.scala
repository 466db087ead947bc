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

  test("feature extraction: fixed dim, deterministic, no driver collect") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir).limit(50))
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getSeq[Double](r.fieldIndex("features")).length == Multimodal.featureDim)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](r.fieldIndex("features"))).toMap
    rows.foreach { r =>
      assert(again(r.getLong(0)) == r.getSeq[Double](r.fieldIndex("features")))
    }
  }
}
