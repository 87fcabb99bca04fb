package graft.sources

import java.time.{Duration, Instant}

/** Windowed HTTP polling source (SURVEY §2.1 S5).
  *
  * The reference polls AFAD with three NiFi timers (egal-project-nifi
  * .xml:4833-4835, 4214-4216, 6547-6549): every `period`, fetch events
  * in `[now − lookback, now]`. Because lookback ≫ period the windows
  * OVERLAP — duplicates are *by design* (missed-event protection) and
  * the engine dedups downstream (O9).
  *
  * The fetcher and clock are injected: production wires an HTTP GET
  * and produces to Kafka; tests (and this zero-egress container) wire
  * fakes. The engine consumes the produced topic via S1 — this class
  * is deliberately OUTSIDE the query engine, like the reference's NiFi
  * layer.
  */
final class HttpPoller(
    fetch: (Instant, Instant) => String,
    sink: String => Unit,
    lookback: Duration,
    clock: () => Instant = () => Instant.now()) {

  /** One poll: fetch the trailing window and emit the raw payload. */
  def pollOnce(): Unit = {
    val now = clock()
    sink(fetch(now.minus(lookback), now))
  }

  /** Fixed-origin variant (the reference's full-history poller:
    * window `[origin, now]`, xml:6547-6549). */
  def pollFromOrigin(origin: Instant): Unit = {
    val now = clock()
    sink(fetch(origin, now))
  }
}

object HttpPoller {
  /** The reference's three configurations (SURVEY §6). */
  val FreshLookback: Duration = Duration.ofMinutes(20)
  val FreshPeriod: Duration = Duration.ofSeconds(30)
  val WeeklyLookback: Duration = Duration.ofDays(7)
  val WeeklyPeriod: Duration = Duration.ofSeconds(15)
  val HistoryOrigin: Instant = Instant.parse("2022-01-01T00:00:00Z")
}
