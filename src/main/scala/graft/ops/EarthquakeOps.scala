package graft.ops

import graft.model.{FaultLines, Wire}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The EGAL operator library (SURVEY.md §2.2): parse → normalize →
  * enrich → dedup, as pure `DataFrame → DataFrame` transformations.
  * The reference exits to RDD+Python lambdas for this
  * (sparktoELKstream.py:102-126); here the whole chain stays inside
  * Catalyst — codegen'd, prunable, pushdown-friendly — so the same
  * code runs unchanged in batch or Structured Streaming, at any scale.
  */
object EarthquakeOps {

  /** O1+O2+O3: Kafka `value` (binary JSON) → one row per event.
    * Array-tolerant: NiFi's JsonRecordSetWriter emits JSON *arrays*
    * (egal-project-nifi.xml:209) while the reference's from_json
    * declares a single object (sparktoELKstream.py:97) and would null
    * out — we implement the intent (per-event rows) and accept both
    * shapes. No UDF: bytes→string is a cast. */
  def parseEvents(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val s = col(valueCol).cast(StringType)
    val asArray = when(startswith(ltrim(s), lit("[")),
      from_json(s, ArrayType(Wire.earthquakeSchema)))
      .otherwise(array(from_json(s, Wire.earthquakeSchema)))
    raw.select(explode(asArray).as("e"))
      .select(col("e.*"))
      .filter(col("date").isNotNull) // unparseable payloads → dropped, not task-fatal
  }

  /** O5: truncate the event time to the minute in ISO-T form
    * (reference date_format at sparktoELKstream.py:99). */
  def normalizeDate(df: DataFrame, c: String = "date"): DataFrame =
    df.withColumn(c, date_format(col(c), "yyyy-MM-dd'T'HH:mm"))

  /** O8: province → fault-line region. Pure `when/isin` chain — a
    * broadcast-free, codegen'd expression; the city table is tiny and
    * constant-folds into the generated code. */
  def faultLine(province: Column): Column =
    when(province.isin(FaultLines.east: _*), FaultLines.East)
      .when(province.isin(FaultLines.north: _*), FaultLines.North)
      .when(province.isin(FaultLines.west: _*), FaultLines.West)
      .otherwise(FaultLines.None)

  /** O6+O7+O8: typed casts, `pointLocation` = "lat,lon", `fault_line`.
    * Keeps the reference's output column order (schema_eQ2,
    * sparktoELKstream.py:107-125) but with real types. `try_cast`
    * (ANSI-safe): bad numerics → null, where the reference's float()
    * would kill the whole task — documented divergence (SURVEY §7). */
  def enrich(df: DataFrame): DataFrame =
    df.select(
      col("date"),
      col("country"),
      col("province"),
      faultLine(col("province")).as("fault_line"),
      col("district"),
      col("depth").try_cast(DoubleType).as("depth"),
      col("magnitude").try_cast(DoubleType).as("magnitude"),
      col("longitude").try_cast(DoubleType).as("longitude"),
      col("latitude").try_cast(DoubleType).as("latitude"),
      concat_ws(",", col("latitude"), col("longitude")).as("pointLocation"),
      col("eventID").try_cast(LongType).as("eventID"),
      col("isEventUpdate").try_cast(BooleanType).as("isEventUpdate"),
      col("lastUpdateDate"),
      col("location"),
      col("neighborhood"),
      col("rms").try_cast(DoubleType).as("rms"),
      col("type"))

  /** O9 parity: whole-row distinct — keeps event *updates* as distinct
    * rows (isEventUpdate/lastUpdateDate differ), exactly like the
    * reference's two .distinct() calls. One shuffle. */
  def dedupWholeRow(df: DataFrame): DataFrame = df.distinct()

  /** O9 extension: latest-wins per eventID (the principled dedup the
    * reference approximates). Window row_number over (eventID) ordered
    * by lastUpdateDate desc. Single shuffle on eventID — at 100 TB
    * this partitions by key and streams each group, no skew risk for
    * a natural event id. */
  def dedupLatestPerEvent(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("eventID"))
      .orderBy(col("lastUpdateDate").desc_nulls_last, col("date").desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** O10+U1: the reference's region analytics — slice per fault line
    * at a magnitude threshold (sparktoELKstream.py:241-292). Exposed
    * both as slices (parity) and as the single-pass groupBy the slices
    * should have been. */
  def regionSlice(df: DataFrame, region: String, minMagnitude: Double): DataFrame =
    df.filter(col("fault_line") === region && col("magnitude") >= minMagnitude)

  def regionCounts(df: DataFrame, minMagnitude: Double): DataFrame =
    df.filter(col("magnitude") >= minMagnitude)
      .groupBy(col("fault_line"))
      .agg(count(lit(1)).as("n"))

  /** A4: global magnitude extremes in one pass (reference: two
    * full-RDD reduce passes, sparktoELKstream.py:318-324). */
  def magnitudeExtremes(df: DataFrame): DataFrame =
    df.agg(min(col("magnitude")).as("min_magnitude"),
      max(col("magnitude")).as("max_magnitude"))

  /** Electric feed: JSON array of {time,data} → typed rows (S7/O2).
    * The wire carries UTC+3-shifted ISO strings (electricraw.py:78);
    * parse as-is and let callers shift at the edge. */
  def parseElectric(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val s = col(valueCol).cast(StringType)
    raw.select(explode(from_json(s, ArrayType(Wire.electricSchema))).as("e"))
      .select(
        to_timestamp(col("e.time")).as("time"),
        coalesce(nanvl(col("e.data"), lit(0.0)), lit(0.0)).as("data"))
  }

  /** Gap scan on the electric series (electricraw.py:146-153): first
    * minute whose sample is the 0.0 gap marker — the producer's resume
    * point. */
  def firstGap(df: DataFrame): DataFrame =
    df.filter(col("data") === 0.0).agg(min(col("time")).as("resume_from"))
}
