package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Typed data model for the earthquake/electric-field domain
  * (SURVEY.md §1). The reference keeps everything stringly-typed
  * (/root/reference/sparktoELKstream.py:80-96, 107-125); we keep that
  * *wire* schema for tolerant parsing, then cast into the typed layer.
  */

/** Fully-typed earthquake event (17 columns after enrichment;
  * reference schema_eQ2 at sparktoELKstream.py:107-125). Bad numerics
  * parse to null (reference's float() would kill the task — our
  * behavior is strictly more robust; divergence documented in SURVEY
  * §7). */
final case class EarthquakeEvent(
    date: Timestamp,
    rms: Option[Double],
    eventID: Option[Long],
    location: String,
    latitude: Option[Double],
    longitude: Option[Double],
    depth: Option[Double],
    eventType: String,
    magnitude: Option[Double],
    country: String,
    province: String,
    district: String,
    neighborhood: String,
    isEventUpdate: Option[Boolean],
    lastUpdateDate: Option[Timestamp],
    faultLine: String,
    pointLocation: String)

/** One electric-field sample (reference wire format
  * electricraw.py:76-87: per-minute {"time", "data"}, NaN→0.0). */
final case class ElectricSample(time: Timestamp, data: Double)

object Wire {
  /** The 15-field all-string wire schema the reference declares at
    * sparktoELKstream.py:80-96. */
  val earthquakeSchema: StructType = StructType(Seq(
    "date", "rms", "eventID", "location", "latitude", "longitude",
    "depth", "type", "magnitude", "country", "province", "district",
    "neighborhood", "isEventUpdate", "lastUpdateDate"
  ).map(StructField(_, StringType, nullable = true)))

  /** Electric sample wire schema (electricraw.py:76-87). Values arrive
    * as JSON arrays of objects (producer bulks ≤900 KB messages). */
  val electricSchema: StructType = StructType(Seq(
    StructField("time", StringType, nullable = true),
    StructField("data", DoubleType, nullable = true)))

  /** Kafka source schema (what the raw-lake archivers persist,
    * eQRawToParquet.py:15-32). */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))
}

/** The fault-line region bucketing table — the reference's core
  * business logic (group_city, sparktoELKstream.py:56-74). Exact
  * Turkish strings; never locale-fold (İ/i problem). `Osmaniye`
  * appears twice in the reference's east list — set semantics make
  * that harmless. */
object FaultLines {
  val east: Seq[String] = Seq(
    "Hatay", "Osmaniye", "Ağrı", "Van", "Hakkari", "Gaziantep",
    "Kahramanmaraş", "Siirt", "Adana", "Malatya", "Adıyaman", "Elazığ",
    "Bingöl", "Şanlıurfa")
  val north: Seq[String] = Seq(
    "Tekirdağ", "İstanbul", "Çanakkale", "Kocaeli", "Sakarya", "Artvin",
    "Düzce", "Bolu", "Karabük", "Çankırı", "Kastamonu", "Çorum",
    "Samsun", "Amasya", "Tokat", "Sivas", "Giresun", "Erzincan",
    "Erzurum", "Muş", "Bitlis", "Bartın", "Gümüşhane")
  val west: Seq[String] = Seq(
    "Balıkesir", "İzmir", "Eskişehir", "Aydın", "Kayseri", "Kırşehir",
    "Konya", "Kütahya", "Manisa", "Muğla", "Isparta", "Denizli",
    "Burdur", "Aksaray", "Uşak", "Afyonkarahisar", "Antalya", "Afyon",
    "Bursa", "Bilecik", "Ankara")

  val East  = "Doğu Anadolu"
  val North = "Kuzey Anadolu"
  val West  = "Batı Anadolu"
  val None  = ""
}
