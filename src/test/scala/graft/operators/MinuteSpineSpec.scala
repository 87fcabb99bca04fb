package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The minute spine must be identical under ANY session timezone —
  * ADVICE r10: the old calendar-day formulation duplicated/dropped
  * rows around DST transitions because a "day" is 23 or 25 hours
  * there. The epoch-minute-integer rewrite has no days at all; this
  * spec pins the invariance on both transition kinds.
  */
class MinuteSpineSpec extends SparkSpec {
  import spark.implicits._

  private def spine(loMicros: Long, hiMicros: Long): Seq[Long] = {
    val bounds = Seq(("k", loMicros, hiMicros)).toDF("key", "l", "h")
      .select($"key", timestamp_micros($"l").as("lo"),
        timestamp_micros($"h").as("hi"))
    Timeseries.minuteSpine(bounds, maxSpanMinutes = 10000)
      .select(unix_micros($"minute_start")).as[Long]
      .collect().toSeq.sorted
  }

  private def underTz[A](tz: String)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try f finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("minuteSpine: identical under UTC and a DST timezone across " +
      "both spring-forward and fall-back transitions; dense, no dups") {
    // America/New_York springs forward 2024-03-10 07:00 UTC and falls
    // back 2024-11-03 06:00 UTC. Each span covers the full local
    // transition day plus both adjacent local midnights.
    val spans = Seq(
      // 2024-03-09 00:00 EST .. 2024-03-11 00:00 EDT (local): a
      // 23-hour local day in the middle
      (1709960400000000L, 1710129600000000L),
      // 2024-11-02 00:00 EDT .. 2024-11-04 00:00 EST: a 25-hour day
      (1730520000000000L, 1730696400000000L))
    for ((lo, hi) <- spans) {
      val utc = underTz("UTC")(spine(lo, hi))
      val ny = underTz("America/New_York")(spine(lo, hi))
      assert(utc === ny,
        s"spine differs across timezones for [$lo, $hi]")
      // dense and duplicate-free: exactly one row per minute in span
      val expected = (lo to hi by 60000000L).toSeq
      assert(utc === expected,
        s"expected ${expected.length} contiguous minutes, got ${utc.length}")
    }
  }

  test("minuteSpine: single-minute span emits one row; span guard " +
      "fires loudly past maxSpanMinutes") {
    val one = spine(1710129600000000L, 1710129600000000L)
    assert(one === Seq(1710129600000000L))
    val e = intercept[Exception] {
      spine(0L, 10001L * 60000000L)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("maxSpanMinutes"), msgs(e))
  }
}
