package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Multimodal-column plumbing: image/audio/video carried as opaque `binary`
  * columns with typed metadata, processed by per-partition batch kernels.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * step is a clearly-marked deterministic STUB (`fakeDecodeFeatures`) — a
  * pure function of the bytes, so tests pin the pipeline end-to-end. The
  * Spark-side contract (schema, partition-batch kernel shape, feature
  * vector output) is real: in production the stub body is replaced by a
  * JNI/FFI decode (or an Arrow-batch Python worker) with the same
  * `Iterator[Row] => Iterator[Row]` signature, and nothing else changes.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = true)))

  /** STUB decode: deterministic "feature vector" = per-chunk mean byte value
    * of `dim` equal chunks, scaled to [0,1]. Stands in for
    * decode→resize→embed; replace the chunk loop with the real codec.
    */
  def fakeDecodeFeature(bytes: Array[Byte], dim: Int): Array[Double] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(dim)(0.0)
    val out = new Array[Double](dim)
    val chunk = math.max(1, bytes.length / dim)
    var j = 0
    while (j < dim) {
      val from = j * chunk
      val to = if (j == dim - 1) bytes.length else math.min(bytes.length, from + chunk)
      var s = 0L
      var i = from
      while (i < to) { s += (bytes(i) & 0xff); i += 1 }
      out(j) = if (to > from) s.toDouble / (to - from) / 255.0 else 0.0
      j += 1
    }
    out
  }

  /** Batch feature extraction: partition-parallel kernel over the binary
    * column. Output `(media_id, features array<double>, n_bytes)`.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8,
                     idCol: String = "media_id",
                     binCol: String = "media"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false)),
      StructField("n_bytes", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        // per-partition batch: real decoders amortize codec init here
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, fakeDecodeFeature(bytes, dim).toSeq,
            if (bytes == null) 0L else bytes.length.toLong)
        }
      }(enc)
  }

  /** "Frame sampling" for video-like payloads: every Nth fixed-size block of
    * the binary as one frame row `(media_id, frame_idx, frame binary)` —
    * the explode-with-position shape a real frame sampler produces.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, blockSize: Int = 256,
                   everyN: Int = 4, idCol: String = "media_id",
                   binCol: String = "media"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          val nBlocks = (bytes.length + blockSize - 1) / blockSize
          (0 until nBlocks by everyN).iterator.map { b =>
            val from = b * blockSize
            val to = math.min(bytes.length, from + blockSize)
            Row(id, b, java.util.Arrays.copyOfRange(bytes, from, to))
          }
        }
      }(enc)
  }
}
