package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2 #35).
  *
  * Images/audio/video ride through Spark as opaque `binary` columns
  * with a typed metadata struct — the schema, partitioning, and
  * batch-iteration shape are the real, tested part. The decode /
  * feature-extraction kernel is a clearly-marked deterministic STUB
  * (the real one would call an image/audio codec inside
  * `mapPartitions` / `mapInPandas`, amortizing model or codec init
  * per batch, exactly like this does with its per-partition "codec").
  *
  * Scale notes: blobs stay in executor memory only for the life of a
  * partition iterator (no collect); feature extraction is a narrow
  * map, so the operator scales with input splits; metadata-only
  * queries prune the binary column at the parquet scan.
  */
object Multimodal {

  val featureDim = 8

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))), nullable = false)))

  /** Deterministic media table synthesized from `documents`: the text
    * bytes stand in for an encoded image/audio payload. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height")).as("meta"))

  /** STUB decode + feature extraction. Real deployments swap the body
    * of `decodeFeatures` for a codec/model call; everything around it
    * (per-partition init, batch iteration, output schema) is the part
    * that matters and is real.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rdd = Dedup.spread(media.select(col("media_id"), col("media_type"), col("payload")))
      .rdd.mapPartitions { rows =>
        // per-partition "codec init" — this is where a real decoder or
        // feature model would be constructed once per task
        val codec = new StubCodec(featureDim)
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"),
            payload.length.toLong, codec.decodeFeatures(payload))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic fake decoder: buckets payload bytes into a fixed-dim
    * histogram-ish feature vector. STUB for an image/audio codec. */
  final class StubCodec(dim: Int) extends Serializable {
    def decodeFeatures(payload: Array[Byte]): Seq[Double] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        acc((payload(i) & 0xff) % dim) += (payload(i) & 0xff).toLong
        i += 1
      }
      val n = math.max(payload.length, 1).toDouble
      acc.toSeq.map(v => math.rint(v / n * 1e6) / 1e6)
    }
  }

  /** Query surface: features + metadata, binary column pruned away. */
  def featureSummary(media: DataFrame): DataFrame =
    extractFeatures(media)
      .select(col("media_id"), col("media_type"), col("n_bytes"),
        round(aggregate(col("features"), lit(0.0), (a, x) => a + x), 6).as("feature_mass"))
}
