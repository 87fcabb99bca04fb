package graft

import graft.sources.Lake
import graft.streaming.Jobs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Latest-wins lake MERGE: partition-scoped rewrite, version
  * resolution, idempotent replay, and the streaming foreachBatch
  * wrapper. */
class LakeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-upsert").toString

  private def seed(path: String): Unit =
    Lake.upsertLatest(spark, path,
      Seq(
        (1L, 1L, "2024-01-01 10:00:00", "a-v1"),
        (2L, 1L, "2024-01-01 11:00:00", "b-v1"),
        (3L, 1L, "2024-01-02 09:00:00", "c-v1"))
        .toDF("id", "version", "ts", "payload")
        .withColumn("ts", col("ts").cast("timestamp")),
      "id", "version", "ts")

  private def state(path: String): Map[Long, (Long, String)] =
    spark.read.parquet(path).select($"id", $"version", $"payload")
      .as[(Long, Long, String)].collect()
      .map { case (i, v, p) => i -> (v, p) }.toMap

  test("upsert replaces lower versions, inserts new keys, keeps the rest") {
    val path = tmp()
    seed(path)
    Lake.upsertLatest(spark, path,
      Seq(
        (1L, 2L, "2024-01-01 10:00:00", "a-v2"), // update
        (4L, 1L, "2024-01-01 12:00:00", "d-v1")) // insert
        .toDF("id", "version", "ts", "payload")
        .withColumn("ts", col("ts").cast("timestamp")),
      "id", "version", "ts")
    assert(state(path) === Map(
      1L -> (2L, "a-v2"), 2L -> (1L, "b-v1"),
      3L -> (1L, "c-v1"), 4L -> (1L, "d-v1")))
  }

  test("atomicDays commit mode is result-identical to the dynamic " +
      "overwrite (same merge, different commit protocol), across " +
      "update + insert + a fresh-day batch") {
    val path1 = tmp(); val path2 = tmp()
    def run(p: String, atomic: Boolean): Unit = {
      Lake.upsertLatest(spark, p,
        Seq(
          (1L, 1L, "2024-01-01 10:00:00", "a-v1"),
          (3L, 1L, "2024-01-02 09:00:00", "c-v1"))
          .toDF("id", "version", "ts", "payload")
          .withColumn("ts", col("ts").cast("timestamp")),
        "id", "version", "ts", atomicDays = atomic)
      Lake.upsertLatest(spark, p,
        Seq(
          (1L, 2L, "2024-01-01 10:00:00", "a-v2"), // same-day update
          (4L, 1L, "2024-01-03 12:00:00", "d-v1")) // fresh day
          .toDF("id", "version", "ts", "payload")
          .withColumn("ts", col("ts").cast("timestamp")),
        "id", "version", "ts", atomicDays = atomic)
    }
    run(path1, atomic = false)
    run(path2, atomic = true)
    assert(state(path2) === state(path1))
    // partition layout is equivalent too (same event_date dirs)
    def dates(p: String) = spark.read.parquet(p)
      .select($"event_date".cast("string")).as[String].collect().toSet
    assert(dates(path2) === dates(path1))
    // no commit-machinery residue next to the atomic lake
    val fs = new org.apache.hadoop.fs.Path(path2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (suffix <- Seq("__upsert_day_stage", "__upsert_day_old"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(path2 + suffix)),
        s"leftover $suffix")
  }

  test("stale update loses; same-version collision prefers the update") {
    val path = tmp()
    seed(path)
    Lake.upsertLatest(spark, path,
      Seq(
        (1L, 0L, "2024-01-01 10:00:00", "a-stale"),
        (2L, 1L, "2024-01-01 11:00:00", "b-v1-rewrite"))
        .toDF("id", "version", "ts", "payload")
        .withColumn("ts", col("ts").cast("timestamp")),
      "id", "version", "ts")
    val s = state(path)
    assert(s(1L) === (1L, "a-v1"))         // stale version rejected
    assert(s(2L) === (1L, "b-v1-rewrite")) // tie → incoming wins
  }

  test("replaying the same batch is idempotent (foreachBatch retries)") {
    val path = tmp()
    seed(path)
    val batch = Seq((1L, 2L, "2024-01-01 10:00:00", "a-v2"))
      .toDF("id", "version", "ts", "payload")
      .withColumn("ts", col("ts").cast("timestamp"))
    Lake.upsertLatest(spark, path, batch, "id", "version", "ts")
    val first = state(path)
    Lake.upsertLatest(spark, path, batch, "id", "version", "ts")
    assert(state(path) === first)
  }

  test("duplicate (key, version) rows WITHIN one batch pick a " +
      "content-deterministic winner — replay persists the same row") {
    val batch = Seq(
      (9L, 7L, "2024-01-05 10:00:00", "payload-A"),
      (9L, 7L, "2024-01-05 10:00:00", "payload-B"))
      .toDF("id", "version", "ts", "payload")
    val path1 = tmp(); val path2 = tmp()
    // two independent lakes, same batch (fresh shuffles each): the
    // winner must agree — shuffle order may not decide it
    Lake.upsertLatest(spark, path1, batch, "id", "version", "ts")
    Lake.upsertLatest(spark, path2,
      batch.repartition(7), "id", "version", "ts")
    val w1 = Lake.read(spark, path1).select("payload").as[String].head()
    val w2 = Lake.read(spark, path2).select("payload").as[String].head()
    assert(w1 === w2, s"$w1 vs $w2")
    assert(Lake.read(spark, path1).count() === 1L)
  }

  test("a read failure of an EXISTING lake propagates — it must not " +
      "present as an empty lake and wipe the touched partitions") {
    val path = tmp()
    seed(path)
    // plant a corrupt parquet file inside a data partition: the
    // pre-fix Try(...).toOption swallowed the read error, took the
    // first-batch branch, and the dynamic overwrite DELETED all
    // pre-existing rows of the touched dates
    val part = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("event_date=")).head
    java.nio.file.Files.write(
      java.nio.file.Paths.get(part.getPath, "corrupt.parquet"),
      "not a parquet file".getBytes)
    intercept[Throwable] {
      Lake.upsertLatest(spark,
        path, Seq((1L, 9L, "2024-01-01 12:00:00", "a-v9"))
          .toDF("id", "version", "ts", "payload"),
        "id", "version", "ts")
    }
    // and nothing was destroyed
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(part.getPath, "corrupt.parquet"))
    assert(Lake.read(spark, path).count() === 3L)
  }

  test("untouched date partitions are not rewritten") {
    val path = tmp()
    seed(path)
    def fileSet(p: String) = {
      val d = new java.io.File(s"$path/event_date=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val before = fileSet("2024-01-02")
    Lake.upsertLatest(spark, path,
      Seq((1L, 2L, "2024-01-01 10:00:00", "a-v2"))
        .toDF("id", "version", "ts", "payload")
        .withColumn("ts", col("ts").cast("timestamp")),
      "id", "version", "ts")
    assert(fileSet("2024-01-02") === before) // day-2 partition untouched
    assert(state(path)(1L) === (2L, "a-v2"))
  }

  test("re-dating a key is partition-scoped (documented contract) and " +
      "dropSupersededVersions cleans the stray") {
    val path = tmp()
    seed(path)
    // key 1 moves from 2024-01-01 to 2024-01-03 at a higher version:
    // the new date's partition gets the winner; the superseded row in
    // the old partition is NOT rewritten — upsertLatest is a
    // partition-scoped MERGE (the old day isn't in the affected set)
    Lake.upsertLatest(spark, path,
      Seq((1L, 2L, "2024-01-03 08:00:00", "a-v2-redated"))
        .toDF("id", "version", "ts", "payload")
        .withColumn("ts", col("ts").cast("timestamp")),
      "id", "version", "ts")
    val rows = spark.read.parquet(path)
      .filter($"id" === 1L)
      .select($"version", $"payload", $"event_date".cast("string"))
      .as[(Long, String, String)].collect().toSet
    assert(rows === Set(
      (1L, "a-v1", "2024-01-01"),        // stranded superseded row
      (2L, "a-v2-redated", "2024-01-03"))) // the new winner
    // the maintenance pass removes the stranded version globally
    Lake.dropSupersededVersions(spark, path, "id", "version")
    val after = spark.read.parquet(path)
      .select($"id", $"version", $"payload").as[(Long, Long, String)]
      .collect().groupBy(_._1).view.mapValues(_.toSet).toMap
    assert(after(1L) === Set((1L, 2L, "a-v2-redated")))
    assert(after(2L) === Set((2L, 1L, "b-v1"))) // untouched keys intact
    assert(after(3L) === Set((3L, 1L, "c-v1")))
  }

  test("schema evolution: appended files with new columns read back merged") {
    val path = tmp()
    Seq((1L, "2024-01-01 10:00:00"))
      .toDF("id", "ts").withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("append").parquet(path)
    // later writer adds a column — the archive must stay readable
    Seq((2L, "2024-01-02 10:00:00", "extra"))
      .toDF("id", "ts", "note").withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("append").parquet(path)
    val merged = Lake.readEvolving(spark, path)
    assert(merged.columns.toSet === Set("id", "ts", "note", "event_date"))
    val byId = merged.select($"id", $"note").as[(Long, Option[String])]
      .collect().toMap
    assert(byId(1L) === None) // old file: new column null
    assert(byId(2L) === Some("extra"))
  }

  test("schema evolution day-2 contract: a widened UPSERT null-fills " +
      "old rows, survives maintenance, and z-orders; a type CHANGE " +
      "fails loudly") {
    val path = tmp()
    seed(path) // (id, version, ts, payload)
    // the stream gains `region`: the upsert must merge, old partitions
    // and losing rows surfacing NULL in the new column
    Lake.upsertLatest(spark, path,
      Seq((2L, 2L, "2024-01-01 12:00:00", "b-v2", "eu"),
          (4L, 1L, "2024-01-03 08:00:00", "d-v1", "us"))
        .toDF("id", "version", "ts", "payload", "region")
        .withColumn("ts", col("ts").cast("timestamp")),
      "id", "version", "ts")
    val widened = Lake.readEvolving(spark, path)
      .select($"id", $"version", $"payload", $"region")
      .as[(Long, Long, String, Option[String])].collect()
      .map { case (i, v, p, r) => i -> ((v, p, r)) }.toMap
    assert(widened === Map(
      1L -> ((1L, "a-v1", None)),       // untouched partition: null-fill
      2L -> ((2L, "b-v2", Some("eu"))), // updated row carries the column
      3L -> ((1L, "c-v1", None)),
      4L -> ((1L, "d-v1", Some("us")))), widened.toString)
    // an OLD-schema producer still upserting after the widening also
    // merges (its rows null-fill the column it does not know about)
    Lake.upsertLatest(spark, path,
      Seq((3L, 2L, "2024-01-02 10:00:00", "c-v2"))
        .toDF("id", "version", "ts", "payload")
        .withColumn("ts", col("ts").cast("timestamp")),
      "id", "version", "ts")
    // maintenance over the mixed-schema lake must PRESERVE the new
    // column (a non-merged read would sample one old footer and the
    // rewrite would destroy it) and homogenize old rows to NULL
    Lake.dropSupersededVersions(spark, path, "id", "version")
    Lake.compact(spark, path)
    val after = spark.read.parquet(path) // plain read: post-compaction
      .select($"id", $"version", $"region")
      .as[(Long, Long, Option[String])].collect()
      .map { case (i, v, r) => i -> ((v, r)) }.toMap
    assert(after === Map(
      1L -> ((1L, None)), 2L -> ((2L, Some("eu"))),
      3L -> ((2L, None)), 4L -> ((1L, Some("us")))), after.toString)
    // the widened lake z-orders (evolution-neutral write path)
    val zpath = tmp()
    Lake.writeZOrdered(Lake.readEvolving(spark, path)
        .withColumn("vv", $"version" + lit(10L)),
      zpath, Seq("version", "vv"), bits = 4, nFiles = 2)
    assert(spark.read.parquet(zpath).columns.contains("region"))
    // a TYPE CHANGE on a shared column dies loudly — silent union
    // coercion would rewrite history (long payload over string)
    val e = intercept[IllegalArgumentException] {
      Lake.upsertLatest(spark, path,
        Seq((5L, 1L, "2024-01-03 09:00:00", 42L))
          .toDF("id", "version", "ts", "payload")
          .withColumn("ts", col("ts").cast("timestamp")),
        "id", "version", "ts")
    }
    assert(e.getMessage.contains("type CHANGE") &&
      e.getMessage.contains("payload"), e.getMessage)
  }

  test("streaming upsert via foreachBatch reaches latest-wins state") {
    implicit val sqlCtx = spark.sqlContext
    val path = tmp()
    val input = MemoryStream[(Long, Long, String, String)]
    val updates = input.toDF()
      .toDF("id", "version", "ts", "payload")
      .withColumn("ts", col("ts").cast("timestamp"))
    val query = Jobs.upsertStream(updates, path,
      Files.createTempDirectory("graft-upsert-ck").toString,
      "id", "version", "ts").start()
    try {
      input.addData((1L, 1L, "2024-01-01 10:00:00", "a-v1"))
      query.processAllAvailable()
      input.addData(
        (1L, 2L, "2024-01-01 10:00:00", "a-v2"),
        (2L, 1L, "2024-01-02 09:00:00", "b-v1"))
      query.processAllAvailable()
      assert(state(path) === Map(1L -> (2L, "a-v2"), 2L -> (1L, "b-v1")))
    } finally query.stop()
  }
}
