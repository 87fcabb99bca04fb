package graft

import graft.model.FaultLines
import graft.ops.EarthquakeOps
import org.apache.spark.sql.DataFrame

/** Unit tests per SURVEY §5 item 1: fixture JSON through
  * parse→normalize→enrich→dedup, covering the FIXTURES.md cases —
  * all three city lists + unlisted province, Turkish characters,
  * magnitude threshold straddle, whole-row dups, same-eventID
  * update pairs, array vs single-object messages. */
class EarthquakeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(date: String, id: String, province: String, mag: String,
      lat: String = "37.288", lon: String = "37.043",
      isUpdate: String = "false", lastUpdate: String = ""): String =
    s"""{"date":"$date","rms":"0.5","eventID":"$id","location":"$province center",
       |"latitude":"$lat","longitude":"$lon","depth":"8.6","type":"Ke",
       |"magnitude":"$mag","country":"Türkiye","province":"$province",
       |"district":"Merkez","neighborhood":"Gazi","isEventUpdate":"$isUpdate",
       |"lastUpdateDate":"$lastUpdate"}""".stripMargin.replaceAll("\n", "")

  private val fixtures: Seq[String] = Seq(
    // array-wrapped message: 3 provinces from 3 lists + 1 unlisted
    s"""[${ev("2023-02-06T04:17:10", "546745", "Kahramanmaraş", "7.7")},
       |${ev("2023-02-06T04:18:20", "546746", "İstanbul", "3.9")},
       |${ev("2023-02-06T04:19:30", "546747", "İzmir", "4.0")},
       |${ev("2023-02-06T04:20:40", "546748", "Trabzon", "2.1")}]""".stripMargin.replaceAll("\n", ""),
    // single-object message (non-array shape must also parse)
    ev("2023-02-06T05:00:00", "546749", "Şanlıurfa", "4.5"),
    // exact duplicate of the first event (poll-window overlap)
    s"[${ev("2023-02-06T04:17:10", "546745", "Kahramanmaraş", "7.7")}]",
    // same eventID, updated magnitude + lastUpdateDate
    s"""[${ev("2023-02-06T04:17:10", "546745", "Kahramanmaraş", "7.8",
      isUpdate = "true", lastUpdate = "2023-02-06T06:00:00")}]""",
    // garbage payload — must be dropped, not task-fatal
    "not json at all")

  private lazy val raw: DataFrame =
    fixtures.toDF("json").selectExpr("cast(json as binary) as value")
  private lazy val enriched: DataFrame =
    EarthquakeOps.enrich(EarthquakeOps.normalizeDate(EarthquakeOps.parseEvents(raw)))

  test("parse: array and single-object messages both yield per-event rows; garbage dropped") {
    val parsed = EarthquakeOps.parseEvents(raw)
    assert(parsed.count() === 7) // 4 + 1 + 1 + 1, garbage dropped
    assert(parsed.columns.toSeq.take(3) === Seq("date", "rms", "eventID"))
  }

  test("normalizeDate truncates to minute in ISO-T form (ref :99)") {
    val dates = enriched.select("date").as[String].collect().toSet
    assert(dates.contains("2023-02-06T04:17"))
    assert(dates.forall(_.length == "yyyy-MM-ddTHH:mm".length))
  }

  test("fault_line buckets exactly per the reference city lists (ref :56-74)") {
    val byProvince = enriched.select($"province", $"fault_line").distinct()
      .as[(String, String)].collect().toMap
    assert(byProvince("Kahramanmaraş") === FaultLines.East)
    assert(byProvince("Şanlıurfa") === FaultLines.East)
    assert(byProvince("İstanbul") === FaultLines.North)
    assert(byProvince("İzmir") === FaultLines.West)
    assert(byProvince("Trabzon") === FaultLines.None) // unlisted → ''
  }

  test("enrich: typed casts + pointLocation (ref :103-105)") {
    val row = enriched.filter($"eventID" === 546745L && $"magnitude" === 7.7)
      .select($"depth", $"magnitude", $"pointLocation").head()
    assert(row.getDouble(0) === 8.6)
    assert(row.getDouble(1) === 7.7)
    assert(row.getString(2) === "37.288,37.043")
  }

  test("whole-row dedup keeps updates as separate rows (parity, ref :99,105)") {
    val d = EarthquakeOps.dedupWholeRow(enriched)
    // 7 parsed - 1 exact dup = 6; the updated 546745 stays (differs)
    assert(d.count() === 6)
    assert(d.filter($"eventID" === 546745L).count() === 2)
  }

  test("latest-wins dedup resolves updates per eventID (extension)") {
    val d = EarthquakeOps.dedupLatestPerEvent(EarthquakeOps.dedupWholeRow(enriched))
    assert(d.count() === 5)
    val updated = d.filter($"eventID" === 546745L).select($"magnitude").head()
    assert(updated.getDouble(0) === 7.8) // the lastUpdateDate row won
  }

  test("region slices + threshold filter match single-pass groupBy (ref :241-303)") {
    val d = EarthquakeOps.dedupWholeRow(enriched)
    val east = EarthquakeOps.regionSlice(d, FaultLines.East, 4.0).count()
    val north = EarthquakeOps.regionSlice(d, FaultLines.North, 4.0).count()
    val west = EarthquakeOps.regionSlice(d, FaultLines.West, 4.0).count()
    assert(east === 3) // 7.7, 7.8, Şanlıurfa 4.5
    assert(north === 0) // İstanbul 3.9 below threshold
    assert(west === 1) // İzmir exactly 4.0 (>= semantics, ref :241)
    val grouped = EarthquakeOps.regionCounts(d, 4.0)
      .as[(String, Long)].collect().toMap
    assert(grouped.getOrElse(FaultLines.East, 0L) === east)
    assert(grouped.getOrElse(FaultLines.West, 0L) === west)
    assert(!grouped.contains(FaultLines.North))
  }

  test("magnitude extremes in one pass (ref :318-324)") {
    val r = EarthquakeOps.magnitudeExtremes(EarthquakeOps.dedupWholeRow(enriched)).head()
    assert(r.getDouble(0) === 2.1)
    assert(r.getDouble(1) === 7.8)
  }

  test("bad numerics null out instead of killing the task (documented divergence)") {
    val bad = Seq(s"""[{"date":"2023-01-01T00:00:00","magnitude":"NaNopey","depth":"x",
      |"eventID":"1","province":"Ankara","latitude":"1","longitude":"2","rms":"r",
      |"location":"l","type":"t","country":"c","district":"d","neighborhood":"n",
      |"isEventUpdate":"false","lastUpdateDate":""}]""".stripMargin.replaceAll("\n", ""))
      .toDF("json").selectExpr("cast(json as binary) as value")
    val e = EarthquakeOps.enrich(EarthquakeOps.parseEvents(bad))
    val row = e.select($"magnitude", $"depth", $"rms", $"fault_line").head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
    assert(row.getString(3) === FaultLines.West) // Ankara
  }

  test("electric feed: array parse, NaN→0.0, gap scan (electricraw.py:76-87,146-153)") {
    val msgs = Seq(
      """[{"time":"2023-01-01T00:00:00","data":12.34},
        |{"time":"2023-01-01T00:01:00","data":NaN},
        |{"time":"2023-01-01T00:02:00","data":56.78}]""".stripMargin.replaceAll("\n", ""))
      .toDF("json").selectExpr("cast(json as binary) as value")
    val parsed = EarthquakeOps.parseElectric(msgs)
    assert(parsed.count() === 3)
    val gap = EarthquakeOps.firstGap(parsed).head()
    assert(gap.getTimestamp(0).toString.startsWith("2023-01-01 00:01"))
  }
}
