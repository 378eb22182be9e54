package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata next to the interleaved span table
  * (input_hint). The Spark-side shape — schema, partition-friendly batch
  * processing, UDF signatures — is real and tested; the actual
  * image/audio decode is STUBBED with a deterministic fake (the decode
  * libraries are not present in this environment; swap `decodeStub` for a
  * real decoder behind the same signature).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType, nullable = false),
    StructField("mime", StringType),
    StructField("bytes", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  /** STUB decode: deterministic pseudo-features from the payload bytes
    * (FNV over content, folded into `dim` floats). A real implementation
    * decodes the image/audio and runs a feature extractor; the signature
    * (binary -> array<float>) and the batched execution are the contract.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes != null) {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= 0x100000001b3L
        out((i % dim + dim) % dim) =
          (out(i % dim) + ((h >>> 40).toInt & 0xffff) / 65536.0f)
        i += 1
      }
    }
    out
  }

  val decodeFeaturesUdf = udf((b: Array[Byte], dim: Int) => decodeStub(b, dim))

  /** Feature extraction over a media table: partition by a hash of the
    * ref (decode work is embarrassingly parallel and skew-free), run the
    * decode per row. At scale the repartition bounds per-task memory for
    * large payloads; column pruning keeps `bytes` out of any stage that
    * doesn't decode.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      partitions: Int = 0): DataFrame = {
    val repart = if (partitions > 0)
      media.repartition(partitions, col("media_ref")) else media
    repart.withColumn("features",
      decodeFeaturesUdf(col("bytes"), lit(dim)))
  }

  /** Byte-value histogram over the raw payload — a real (not stubbed)
    * content feature computable without any decode library: bin counts of
    * `byte % bins`. Cheap, deterministic, and SQL-mirrorable, so the
    * binary-column feature path sits under the DuckDB oracle gate.
    */
  def byteHistogram(bytes: Array[Byte], bins: Int): Array[Long] = {
    val out = new Array[Long](bins)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) {
        out((bytes(i) & 0xff) % bins) += 1
        i += 1
      }
    }
    out
  }

  val byteHistogramUdf = udf((b: Array[Byte], bins: Int) => byteHistogram(b, bins))

  /** extractFeatures with the histogram feature (real path). */
  def byteFeatures(media: DataFrame, bins: Int = 16,
                   partitions: Int = 0): DataFrame = {
    val repart = if (partitions > 0)
      media.repartition(partitions, col("media_ref")) else media
    repart.withColumn("features", byteHistogramUdf(col("bytes"), lit(bins)))
  }

  /** Synthetic thumbnail/resize stage (STUB): emits deterministic resized
    * metadata; real implementation would transcode `bytes`.
    */
  def resizeStub(media: DataFrame, maxDim: Int = 256): DataFrame =
    media
      .withColumn("out_width",
        when(col("width") >= col("height"), lit(maxDim))
          .otherwise((col("width") * maxDim / col("height")).cast(IntegerType)))
      .withColumn("out_height",
        when(col("height") > col("width"), lit(maxDim))
          .otherwise((col("height") * maxDim / col("width")).cast(IntegerType)))

  /** Frame sampling for video rows (STUB): one synthetic frame ref per
    * `everyMs` of duration — an explode-shaped generator, the real
    * version decodes frames.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media
      .filter(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .select(col("media_ref"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_ms"))
      .withColumn("frame_ref",
        concat(col("media_ref"), lit("#t="), col("frame_ms")))
}
