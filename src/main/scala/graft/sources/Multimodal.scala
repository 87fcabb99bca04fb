package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by batched per-partition
  * transforms (the Scala analog of `mapInPandas`).
  *
  * The actual codec libraries are NOT in this container, so the decode
  * kernel is a clearly-marked DETERMINISTIC STUB — everything around
  * it (schema, batching, partition parallelism, null discipline) is
  * the real production shape: swap `decodeStub` for an FFI call and
  * nothing else changes.
  */
/** The codec boundary, as a TYPE: everything Spark-side (schema,
  * batching, partition parallelism, null discipline) programs against
  * this trait, so swapping the deterministic test stub for a real
  * FFI-backed codec (libjpeg/ffmpeg/ONNX via JNI) is compile-checked —
  * implement these two methods and nothing else changes. Must be
  * Serializable: instances ship inside `mapPartitions` closures. */
trait MediaCodec extends Serializable {
  /** bytes → (width, height, n_frames, format). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, String)
  /** bytes → unit-norm feature embedding of length `dim`. */
  def featurize(bytes: Array[Byte], dim: Int): Array[Float]
}

/** ======== STUB ========
  * Deterministic fake codec: derives plausible metadata and features
  * purely from the bytes — no codec libraries exist in this container.
  * The production build swaps in an FFI-backed [[MediaCodec]]; batch
  * shape, schema, and everything downstream stay identical. */
object StubCodec extends MediaCodec {
  override def decode(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val len = bytes.length
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(len, 64)) { h = h * 31 + bytes(i); i += 1 }
    val width = 64 + math.floorMod(h, 577).toInt        // 64..640
    val height = 64 + math.floorMod(h >> 16, 417).toInt // 64..480
    val frames = 1 + math.floorMod(h >> 32, 16).toInt   // 1..16
    (width, height, frames, if (len % 2 == 0) "img" else "vid")
  }

  override def featurize(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ bytes(i)) * 1099511628211L
      out(math.floorMod(i, dim)) += (h % 1000) / 1000.0f
      i += 1
    }
    val n = math.sqrt(out.map(x => x.toDouble * x).sum)
    if (n > 0) out.map(x => (x / n).toFloat) else out
  }
}
/** ====== END STUB ====== */

object Multimodal {

  /** Typed metadata emitted by the decoder. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Back-compat aliases for the stub kernels (specs reference these). */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, String) =
    StubCodec.decode(bytes)
  def featurizeStub(bytes: Array[Byte], dim: Int): Array[Float] =
    StubCodec.featurize(bytes, dim)

  /** Attach decoded metadata to a DataFrame with a binary `media`
    * column. Batched per partition (no per-row task overhead), output
    * schema declared up front — the `mapInPandas` shape. */
  def withMediaMeta(df: DataFrame, binaryCol: String = "media",
      codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", mediaMetaSchema, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta = if (r.isNullAt(idx)) null else {
          val bytes = r.getAs[Array[Byte]](idx)
          val (w, h, f, fmt) = codec.decode(bytes)
          Row(bytes.length, w, h, f, fmt)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** "Frame sampling": emit every `stride`-th frame index as a row —
    * the explode-shaped transform a video pipeline needs. Pure
    * expressions; at scale this is a generator, not a shuffle. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col("media_meta.n_frames") - 1,
        lit(stride))))

  /** Attach a feature embedding extracted from the binary column —
    * batched per partition, declared output schema; the result feeds
    * straight into [[graft.operators.Similarity]] ANN/dedup. */
  def withFeatures(df: DataFrame, dim: Int = 64,
      binaryCol: String = "media",
      codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val idx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val vec = if (r.isNullAt(idx)) null
          else codec.featurize(r.getAs[Array[Byte]](idx), dim).toSeq
        Row.fromSeq(r.toSeq :+ vec)
      }
    }(enc)
  }

  /** "Resize": recompute metadata for a target box preserving aspect
    * ratio — pure column arithmetic over the decoded metadata (the
    * pixel work happens in the decode kernel at materialization). */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("media_meta.width").cast(DoubleType)
    val h = col("media_meta.height").cast(DoubleType)
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    df.withColumn("resized_w", floor(w * scale).cast(IntegerType))
      .withColumn("resized_h", floor(h * scale).cast(IntegerType))
  }

  /** Build a synthetic media column from text (UTF-8 bytes) — lets the
    * plumbing be exercised against the driver's documents table. */
  def mediaFromText(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8"))
}
