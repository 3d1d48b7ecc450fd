package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (SURVEY §2.12).
  *
  * Media are opaque `BinaryType` columns with a typed metadata struct; the
  * Spark-side plumbing (schema, partition-sized batching, decode fan-out)
  * is real and tested, while the actual codec call is STUBBED — this
  * container has no image/audio libraries, so `decodeStub` derives
  * deterministic fake features from the bytes. Swap `decodeStub`'s body for
  * a real decoder (or a Python `mapInPandas` stage) without touching any
  * schema or partitioning.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("declared_bytes", LongType))))))

  /** Ingest: wrap a text column as fake media bytes (UTF-8) + metadata.
    * Real pipelines read binary files (`spark.read.format("binaryFile")`)
    * into exactly this shape. */
  def ingestAsMedia(df: DataFrame, idCol: String, textCol: String,
                    sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image/fake").as("modality"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(
        col(sourceCol).as("source"),
        octet_length(col(textCol)).cast("long").as("declared_bytes")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("byte_len", LongType),
    StructField("first_byte", IntegerType),
    StructField("feature", ArrayType(DoubleType))))

  /** Partition-wise decode: the distributed shape of a codec stage — one
    * iterator pass per partition, constant memory, no driver involvement.
    *
    * STUB: a real implementation calls the codec here (JNI/ffmpeg/PIL via
    * mapInPandas); this one derives 4 deterministic pseudo-features from the
    * raw bytes so downstream stages (and tests) have stable values. */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val len = bytes.length.toLong
        val first = if (bytes.nonEmpty) bytes(0) & 0xff else 0
        // ??? real codec goes here; fake features = byte-range means
        val feature = (0 until 4).map { q =>
          val from = (len * q / 4).toInt
          val until = (len * (q + 1) / 4).toInt
          if (until > from)
            bytes.slice(from, until).map(b => (b & 0xff).toDouble).sum / (until - from)
          else 0.0
        }.map(v => math.rint(v * 100) / 100).toArray
        Row(id, len, first, feature)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** "Resize" for fake images: deterministic byte-space downsampling to
    * `targetBytes` (every ⌈len/target⌉-th byte). STUB for a real resampler
    * — a production version swaps the loop body for the codec call; the
    * partition-wise plumbing, schema, and determinism contract are what
    * downstream stages depend on. */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("content", BinaryType),
      StructField("orig_bytes", LongType)))
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val stride = math.max(1, math.ceil(bytes.length.toDouble / targetBytes).toInt)
        val out = bytes.indices.collect { case i if i % stride == 0 => bytes(i) }.toArray
        Row(id, out, bytes.length.toLong)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** "Frame sampling" for fake video: every `stride`-th 16-byte chunk,
    * emitted one row per frame — the explode shape a real frame sampler
    * has. Pure column expressions, no UDF. */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0L), greatest(
          floor((octet_length(col("content")) - 1) / lit(16 * stride)).cast("long"), lit(0L))),
        i => substring(col("content"), (i * 16 * stride + 1).cast("int"), lit(16))))
        .as(Seq("frame_no", "frame_bytes")))
}
