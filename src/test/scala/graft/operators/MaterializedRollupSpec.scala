package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MaterializedRollup]]: the merge algebra (count/sum/min/max over
  * quantized integers) must make any disjoint batch split
  * bit-identical to the single-shot recompute — that's the whole
  * point of maintaining the rollup incrementally. */
class MaterializedRollupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0) = new java.sql.Timestamp(
    (day.toLong * 86400L + h * 3600L) * 1000L)

  private val events = Seq(
    ("a", ts(100, 1), 1.5),
    ("a", ts(100, 5), -2.25),
    ("a", ts(101, 2), 4.0),
    ("b", ts(100, 3), 10.0),
    ("b", ts(100, 4), 10.0)
  ).toDF("event_type", "ts", "value")

  test("aggregate: hand-checked quantized stats per (type, day)") {
    val got = MaterializedRollup.readout(
        MaterializedRollup.aggregate(events))
      .orderBy($"event_type", $"day")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(got === Seq(
      // a/day100: qv 15000, -22500 → sum -7500, mean -0.375
      ("a", 100L, 2L, -7500L, -22500L, 15000L, -0.375),
      ("a", 101L, 1L, 40000L, 40000L, 40000L, 4.0),
      ("b", 100L, 2L, 200000L, 100000L, 100000L, 10.0)), got.toString)
  }

  test("merge over ANY disjoint split ≡ single-shot recompute, " +
      "including a late event for an old day in the delta batch") {
    val full = MaterializedRollup.readout(
        MaterializedRollup.aggregate(events))
      .orderBy($"event_type", $"day")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    // split 1: by ts cutoff (day 101 boundary) — the q127 shape; the
    // delta ALSO carries a late event for day 100 via split 2 below
    val byDay = Seq(
      events.filter($"ts" < lit(ts(101))),
      events.filter($"ts" >= lit(ts(101))))
    // split 2: interleaved thirds — no alignment with days at all
    val withId = events.withColumn("i", monotonically_increasing_id())
    val thirds = (0 until 3).map(r =>
      withId.filter(pmod($"i", lit(3)) === r).drop("i"))
    for (split <- Seq(byDay, thirds)) {
      val merged = MaterializedRollup.readout(
          MaterializedRollup.merge(split.map(
            MaterializedRollup.aggregate(_))))
        .orderBy($"event_type", $"day")
        .as[(String, Long, Long, Long, Long, Long, Double)]
        .collect().toSeq
      assert(merged === full, s"split ${split.size}: $merged")
    }
  }

  test("null type/ts/value and NaN rows are excluded (q117 filter " +
      "contract); empty input yields an empty rollup") {
    val messy = Seq(
      (null: String, ts(100), 1.0),
      ("a", null: java.sql.Timestamp, 1.0),
      ("a", ts(100), Double.NaN),
      ("a", ts(100), 2.0)
    ).toDF("event_type", "ts", "value")
    val got = MaterializedRollup.aggregate(messy)
      .select($"event_type", $"n").as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 1L)))
    assert(MaterializedRollup.aggregate(
      messy.filter($"event_type" === "zzz")).count() === 0L)
  }

  private def withLake(body: String => Unit): Unit = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rollup_lake").toString
    try body(s"$dir/rollup") finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  private def lakeReadout(path: String) =
    MaterializedRollup.readout(MaterializedRollup.readLake(spark, path))
      .orderBy($"event_type", $"day")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq

  test("refreshLake: two-batch fold ≡ single-shot recompute; " +
      "replaying an applied batch is a no-op (idempotent, no " +
      "double-count); a fresh batch after the replay still folds") {
    withLake { path =>
      val full = MaterializedRollup.readout(
          MaterializedRollup.aggregate(events))
        .orderBy($"event_type", $"day")
        .as[(String, Long, Long, Long, Long, Long, Double)]
        .collect().toSeq
      val b1 = events.filter($"ts" < lit(ts(101)))
      val b2 = events.filter($"ts" >= lit(ts(101)))
      MaterializedRollup.refreshLake(spark, path, b1, batchId = 1L)
      MaterializedRollup.refreshLake(spark, path, b2, batchId = 2L)
      assert(lakeReadout(path) === full)
      // crash-after-success replay (foreachBatch retry): same batch,
      // same id — every key is stamped, the fold must be a no-op
      MaterializedRollup.refreshLake(spark, path, b2, batchId = 2L)
      MaterializedRollup.refreshLake(spark, path, b1, batchId = 1L)
      assert(lakeReadout(path) === full, "replay double-counted")
      // a genuinely new batch still merges additively
      val b3 = Seq(("a", ts(100, 6), 1.0)).toDF("event_type", "ts", "value")
      MaterializedRollup.refreshLake(spark, path, b3, batchId = 3L)
      val expect = MaterializedRollup.readout(
          MaterializedRollup.aggregate(events.unionByName(b3)))
        .orderBy($"event_type", $"day")
        .as[(String, Long, Long, Long, Long, Long, Double)]
        .collect().toSeq
      assert(lakeReadout(path) === expect)
    }
  }

  test("refreshLake: a crash MID-upsert (one day stamped, the other " +
      "not) replays without double-counting the stamped day or " +
      "losing the unstamped one") {
    withLake { path =>
      val b1 = events.filter($"ts" < lit(ts(101)))
      MaterializedRollup.refreshLake(spark, path, b1, batchId = 1L)
      // simulate the torn batch 2: its day-101 partition was written
      // (stamped batch_id = 2) but the day-100 late-event partition
      // crashed before the overwrite — hand-apply only the 101 slice
      val b2 = events.filter($"ts" >= lit(ts(101)))
        .unionByName(Seq(("b", ts(100, 7), 5.0))
          .toDF("event_type", "ts", "value"))
      MaterializedRollup.refreshLake(spark, path,
        b2.filter($"ts" >= lit(ts(101))), batchId = 2L)
      // the replay of the FULL batch 2: day 101 keys carry stamp 2
      // (skip), day 100's late "b" row merges from its intact base
      MaterializedRollup.refreshLake(spark, path, b2, batchId = 2L)
      val expect = MaterializedRollup.readout(
          MaterializedRollup.aggregate(events.unionByName(
            Seq(("b", ts(100, 7), 5.0)).toDF("event_type", "ts", "value"))))
        .orderBy($"event_type", $"day")
        .as[(String, Long, Long, Long, Long, Long, Double)]
        .collect().toSeq
      assert(lakeReadout(path) === expect)
    }
  }

  test("refreshLake atomic-day commit: a crash injected at EVERY " +
      "commit point (staged / day-moved-aside / day-installed / " +
      "committed, across a multi-day batch) leaves no pre-batch day " +
      "lost after recovery, and the replay converges to the exact " +
      "recompute") {
    // batch 2 touches THREE days: late events for existing days 100
    // and 101 (each walks the full aside→install→drop-trash sequence)
    // plus fresh day 102 (install-only) — so the seam enumerates every
    // phase the protocol has
    val b1 = events
    val b2 = Seq(
      ("a", ts(100, 8), 2.0),
      ("b", ts(101, 3), 1.0),
      ("c", ts(102, 1), 7.0)
    ).toDF("event_type", "ts", "value")
    val expect = MaterializedRollup.readout(
        MaterializedRollup.aggregate(events.unionByName(b2)))
      .orderBy($"event_type", $"day")
      .as[(String, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    var crashPoint = 1
    var exhausted = false
    val phasesHit = scala.collection.mutable.Set[String]()
    while (!exhausted) {
      withLake { path =>
        MaterializedRollup.refreshLake(spark, path, b1, batchId = 1L)
        var fired = 0
        val n = crashPoint
        val seam: (String, String) => Unit = (phase, day) => {
          fired += 1
          if (fired == n) {
            phasesHit += phase
            throw new RuntimeException(s"injected crash at $phase $day")
          }
        }
        val crashed =
          try {
            MaterializedRollup.refreshLakeSeamed(spark, path, b2, 2L,
              "event_type", "ts", "value", seam)
            false
          } catch {
            case e: RuntimeException
                if e.getMessage.startsWith("injected crash") => true
          }
        if (!crashed) exhausted = true
        else {
          // the closed window, directly: after healing, NO pre-batch
          // day is missing (the dynamic-overwrite residual was exactly
          // a day readable as empty)
          graft.sources.Lake.recoverUpsertDays(spark, path)
          val days = MaterializedRollup.readLake(spark, path)
            .select($"day").distinct().as[Long].collect().toSet
          assert(Set(100L, 101L).subsetOf(days),
            s"crash point $n lost a pre-batch day: $days")
        }
        // foreachBatch retry: same batch, same id — must converge to
        // the recompute from ANY crash state
        MaterializedRollup.refreshLake(spark, path, b2, batchId = 2L)
        assert(lakeReadout(path) === expect,
          s"replay after crash point $n diverged")
      }
      crashPoint += 1
    }
    assert(crashPoint >= 7,
      s"expected >= 6 injected crash points, walked ${crashPoint - 1}")
    assert(phasesHit === Set("staged", "aside", "installed", "committed"),
      s"seam must cover every protocol phase, hit: $phasesHit")
  }

  test("refreshLake: an OLD batch id over a newer stamp fails " +
      "loudly; an empty delta is a no-op; the rollup survives lake " +
      "compaction between batches") {
    withLake { path =>
      MaterializedRollup.refreshLake(spark, path,
        events.filter($"ts" < lit(ts(101))), batchId = 5L)
      val e = intercept[IllegalStateException] {
        MaterializedRollup.refreshLake(spark, path,
          events.filter($"ts" < lit(ts(101))), batchId = 4L)
      }
      assert(e.getMessage.contains("increasing order"), e.getMessage)
      val before = lakeReadout(path)
      MaterializedRollup.refreshLake(spark, path,
        events.filter($"event_type" === "zzz"), batchId = 6L)
      assert(lakeReadout(path) === before)
      // maintenance between batches must not perturb the fold
      graft.sources.Lake.compact(spark, path, nFiles = 1)
      MaterializedRollup.refreshLake(spark, path,
        events.filter($"ts" >= lit(ts(101))), batchId = 7L)
      val full = MaterializedRollup.readout(
          MaterializedRollup.aggregate(events))
        .orderBy($"event_type", $"day")
        .as[(String, Long, Long, Long, Long, Long, Double)]
        .collect().toSeq
      assert(lakeReadout(path) === full)
    }
  }

  test("foreachBatch wiring (q142's shape): a multi-epoch " +
      "MemoryStream run maintains the lake rollup ≡ the single-shot " +
      "recompute, including a late event for an old day") {
    withLake { path =>
      implicit val sqlCtx = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_rollup_ckpt").toString
      val input = MemoryStream[(String, Long, Double)]
      val ev = input.toDF().toDF("event_type", "secs", "value")
        .select($"event_type", timestamp_seconds($"secs").as("ts"),
          $"value")
      val q = ev.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          MaterializedRollup.refreshLake(spark, path, b, batchId = id)
        }
        .option("checkpointLocation", ckpt)
        .start()
      val d = 86400L
      val batches = Seq(
        Seq(("a", 100 * d + 3600, 1.5)),
        Seq(("a", 100 * d + 7200, 2.5), ("b", 101 * d, 3.0)),
        Seq(("a", 100 * d, -1.0))) // late event for the old day
      try batches.foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      } finally q.stop()
      val all = batches.flatten
        .toDF("event_type", "secs", "value")
        .select($"event_type", timestamp_seconds($"secs").as("ts"),
          $"value")
      val expect = MaterializedRollup.readout(
          MaterializedRollup.aggregate(all))
        .orderBy($"event_type", $"day")
        .as[(String, Long, Long, Long, Long, Long, Double)]
        .collect().toSeq
      assert(lakeReadout(path) === expect)
      val p = new org.apache.hadoop.fs.Path(ckpt)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("guards die loudly: quantizer bound, BIGINT readout overflow") {
    val big = Seq(("a", ts(100), 1.0e15)).toDF("event_type", "ts", "value")
    val e1 = intercept[Exception] {
      MaterializedRollup.aggregate(big).collect()
    }
    assert(e1.getMessage.contains("quantization bound"), e1.getMessage)
    // a rollup whose exact decimal sum outgrew int64 must not wrap
    val over = Seq(("a", 100L, 1L, BigDecimal("9223372036854775808"),
        0L, 0L))
      .toDF("event_type", "day", "n", "sum_qv", "min_qv", "max_qv")
      .withColumn("sum_qv",
        $"sum_qv".cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    val e2 = intercept[Exception] {
      MaterializedRollup.readout(over).collect()
    }
    assert(e2.getMessage.contains("overflows BIGINT"), e2.getMessage)
  }
}
