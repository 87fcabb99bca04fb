package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.time.Instant
import graft.model.ElectricSample

/** Electric-field binary series decode (SURVEY §2.1 S6).
  *
  * Wire format (electricraw.py:64-87): a flat file of little-endian
  * float32 samples, one per minute since 2000-01-01 UTC; byte offset
  * of minute m is 4·m. NaN encodes a gap and becomes 0.0 (the
  * consumer's resume-scan looks for the first 0.0 —
  * electricraw.py:146-153); values are rounded to 2 dp.
  */
object ElectricSeries {

  val Epoch: Instant = Instant.parse("2000-01-01T00:00:00Z")

  /** Byte offset of a timestamp's sample (the reference's seek math). */
  def offsetOf(t: Instant): Long =
    java.time.Duration.between(Epoch, t).toMinutes * 4L

  /** Decode a window of samples read at `windowStart` (must be
    * minute-aligned): per-minute timestamps, NaN→0.0, 2 dp. */
  def decode(bytes: Array[Byte], windowStart: Instant): Seq[ElectricSample] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bytes.length / 4
    (0 until n).map { i =>
      val raw = buf.getFloat(i * 4)
      val v = if (java.lang.Float.isNaN(raw)) 0.0
        else math.rint(raw * 100.0) / 100.0
      ElectricSample(
        java.sql.Timestamp.from(windowStart.plusSeconds(60L * i)), v)
    }
  }

  /** First gap (0.0) at or after `from` — the producer's resume point
    * (electricraw.py:146-153). */
  def firstGap(samples: Seq[ElectricSample]): Option[java.sql.Timestamp] =
    samples.find(_.data == 0.0).map(_.time)
}
