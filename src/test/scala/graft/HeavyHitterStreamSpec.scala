package graft

import graft.streaming.HeavyHitterStream
import graft.streaming.HeavyHitterStream.{HHState, KEvent}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

class HeavyHitterStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshState: TestGroupState[HHState] =
    TestGroupState.create[HHState](Optional.empty[HHState],
      GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)

  private def walk(state: TestGroupState[HHState], capacity: Int,
      keys: Long*): Seq[HeavyHitterStream.HHRow] =
    HeavyHitterStream.fn(capacity)(0,
      keys.iterator.map(KEvent(0, _)), state).toSeq

  test("fn walk: insert, increment, replace-min eviction with " +
      "deterministic tie-break, err inheritance, seen accumulation") {
    val s = freshState
    // capacity 2: insert 10×2, 20×1 — 20 is the min
    val r1 = walk(s, 2, 10L, 10L, 20L)
    assert(r1.map(r => (r.key, r.n, r.err, r.seen)).toSet ===
      Set((10L, 2L, 0L, 3L), (20L, 1L, 0L, 3L)))
    // batch 2: key 30 arrives — summary full, evicts min (20, n=1);
    // 30 inherits count 1+1=2 with err 1
    val r2 = walk(s, 2, 30L)
    assert(r2.map(r => (r.key, r.n, r.err, r.seen)).toSet ===
      Set((10L, 2L, 0L, 4L), (30L, 2L, 1L, 4L)))
    // batch 3: 40 arrives — min count is now a TIE (10 at 2, 30 at
    // 2); smallest key (10) is evicted deterministically
    val r3 = walk(s, 2, 40L)
    assert(r3.map(r => (r.key, r.n, r.err, r.seen)).toSet ===
      Set((30L, 2L, 1L, 5L), (40L, 3L, 2L, 5L)))
    // state is exactly the last summary
    assert(s.get.counts === Map(30L -> 2L, 40L -> 3L))
    assert(s.get.errs === Map(30L -> 1L, 40L -> 2L))
  }

  test("fn walk: within-batch updates apply in ascending key order " +
      "(batched determinism) and an empty batch emits nothing") {
    val s = freshState
    // capacity 1: batch {5, 3} — 3 inserts first (ascending order),
    // then 5 evicts it: 5 ends at n=2 (1+1), err=1
    val r = walk(s, 1, 5L, 3L)
    assert(r.map(x => (x.key, x.n, x.err)) === Seq((5L, 2L, 1L)))
    assert(HeavyHitterStream.fn(1)(0, Iterator.empty, s).isEmpty)
    assert(s.get.seen === 2L)
  }

  test("SpaceSaving invariants under heavy eviction: est ≥ true, " +
      "est − err ≤ true, and the mega key always survives") {
    val s = freshState
    // 300 events: key 999 appears 100×, keys 0..199 once each;
    // capacity 16 — far below the 201 distinct keys
    val events = scala.util.Random.shuffle(
      (Seq.fill(100)(999L) ++ (0L until 200L)).toList)
    val truth = events.groupBy(identity).view.mapValues(_.size.toLong)
    events.grouped(60).foreach { b => walk(s, 16, b: _*) }
    val st = s.get
    assert(st.counts.size <= 16)
    assert(st.counts.contains(999L),
      s"mega key evicted: ${st.counts}") // n=100 > 300/16
    st.counts.foreach { case (k, n) =>
      val t = truth.getOrElse(k, 0L)
      val err = st.errs(k)
      assert(n >= t, s"key $k: est $n < true $t")
      assert(n - err <= t, s"key $k: est $n − err $err > true $t")
    }
    assert(st.counts(999L) - st.errs(999L) <= 100L &&
      st.counts(999L) >= 100L)
  }

  test("drained snapshot ≡ exact per-key counts in the exact regime " +
      "(capacity ≥ distinct), across shuffled multi-batch delivery " +
      "and multiple shards; state is nShards rows by construction") {
    implicit val sqlCtx = spark.sqlContext
    // shard is a deterministic function of the key (the contract: a
    // key lives in exactly one shard)
    val raw = (0 until 400).map { i =>
      val k = (i * 13 % 37).toLong; ((k % 4).toInt, k)
    }
    val truth = raw.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val input = MemoryStream[(Int, Long)]
    val out = HeavyHitterStream.topKeys(
      input.toDF().toDF("shard", "key"), capacity = 64)
    val q = out.toDF().writeStream.format("memory")
      .queryName("hh_stream_out").outputMode("append").start()
    try {
      scala.util.Random.shuffle(raw.toList).grouped(150).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      val snap = HeavyHitterStream.latestSnapshot(
        spark.table("hh_stream_out"))
      // a key's count lives in exactly one shard — plain union
      val got = snap.groupBy($"key").agg(sum($"n").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(got === truth)
      assert(snap.filter($"err" =!= 0L).count() === 0L)
      // the engine's own accounting: one state row per shard, ever
      val rows = (q.recentProgress ++ Option(q.lastProgress))
        .filter(_.stateOperators.nonEmpty).lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      assert(rows === raw.map(_._1).distinct.size.toLong,
        s"state rows $rows != shard count")
    } finally q.stop()
  }

  test("globalTopK: cross-shard merge returns the true global top-k " +
      "in (n desc, key) order in the exact regime — heavy keys " +
      "planted in DIFFERENT shards interleave correctly") {
    implicit val sqlCtx = spark.sqlContext
    // shard = key % 3: heavy keys 30 (shard 0, ×50), 31 (shard 1,
    // ×40), 32 (shard 2, ×45) — the global order 30, 32, 31 crosses
    // shard boundaries, so a per-shard-only reader would misorder it
    val raw = (Seq.fill(50)(30L) ++ Seq.fill(40)(31L) ++
      Seq.fill(45)(32L) ++ (100L until 140L))
      .map(k => ((k % 3).toInt, k))
    val input = MemoryStream[(Int, Long)]
    val out = HeavyHitterStream.topKeys(
      input.toDF().toDF("shard", "key"), capacity = 64)
    val q = out.toDF().writeStream.format("memory")
      .queryName("hh_global_out").outputMode("append").start()
    try {
      scala.util.Random.shuffle(raw.toList).grouped(60).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      val got = HeavyHitterStream
        .globalTopK(spark.table("hh_global_out"), k = 4)
        .orderBy($"rank")
        .as[(Long, Long, Long, Long)].collect().toSeq
      // 4th place: the 40 singletons tie at n=1 → smallest key (100)
      assert(got === Seq((30L, 50L, 0L, 1L), (32L, 45L, 0L, 2L),
        (31L, 40L, 0L, 3L), (100L, 1L, 0L, 4L)), got.toString)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      HeavyHitterStream.globalTopK(
        Seq((0, 1L, 1L, 0L, 1L)).toDF("shard", "key", "n", "err",
          "seen"), k = 0)
    }
  }

  test("globalTopK: a key tracked by TWO shards (mis-sharded feed) " +
      "fails loudly instead of emitting duplicate ranks with " +
      "un-summed counts") {
    // hand-built emission table: key 7 appears in shard 0 AND shard 1
    // snapshots — the exact invariant violation a feed hashing with
    // two different nShards values produces
    val emitted = Seq(
      (0, 7L, 5L, 0L, 5L),
      (1, 7L, 3L, 0L, 3L),
      (1, 9L, 2L, 0L, 3L))
      .toDF("shard", "key", "n", "err", "seen")
    val e = intercept[IllegalStateException] {
      HeavyHitterStream.globalTopK(emitted, k = 2).collect()
    }
    assert(e.getMessage.contains("PARTITION the key space"),
      e.getMessage)
    // the same keys correctly sharded pass
    val ok = Seq((0, 7L, 5L, 0L, 5L), (1, 9L, 2L, 0L, 2L))
      .toDF("shard", "key", "n", "err", "seen")
    val got = HeavyHitterStream.globalTopK(ok, k = 2)
      .orderBy($"rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((7L, 5L, 0L, 1L), (9L, 2L, 0L, 2L)),
      got.toString)
    // at-least-once sink replay: a shard's max-seen emission duplicated
    // as BYTE-IDENTICAL rows must neither trip the guard nor fan out
    // the join-back (the guard distinguishes replay from mis-sharding
    // by keeping `shard` through the distinct)
    val replayed = Seq((0, 7L, 5L, 0L, 5L), (0, 7L, 5L, 0L, 5L),
      (1, 9L, 2L, 0L, 2L))
      .toDF("shard", "key", "n", "err", "seen")
    val gotR = HeavyHitterStream.globalTopK(replayed, k = 2)
      .orderBy($"rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(gotR === got, gotR.toString)
    // …while the same key in TWO shards still trips even when the
    // duplicated counts happen to be identical
    val crossSame = Seq((0, 7L, 5L, 0L, 5L), (1, 7L, 5L, 0L, 5L))
      .toDF("shard", "key", "n", "err", "seen")
    intercept[IllegalStateException] {
      HeavyHitterStream.globalTopK(crossSame, k = 2).collect()
    }
  }

  test("globalTopK under eviction: evicted keys stay out (snapshot " +
      "semantics), survivors keep their one-sided bounds in the " +
      "readout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Long)]
    val out = HeavyHitterStream.topKeys(
      input.toDF().toDF("shard", "key"), capacity = 1)
    val q = out.toDF().writeStream.format("memory")
      .queryName("hh_global_evict").outputMode("append").start()
    try {
      input.addData((0, 7L)); q.processAllAvailable()
      input.addData((0, 8L), (0, 8L)); q.processAllAvailable()
      val got = HeavyHitterStream
        .globalTopK(spark.table("hh_global_evict"), k = 10)
        .as[(Long, Long, Long, Long)].collect().toSeq
      // 7 was evicted — a per-key max-seen reader would resurrect it;
      // 8 carries (n=3, err=1): n ≥ true(2), n − err ≤ true
      assert(got === Seq((8L, 3L, 1L, 1L)), got.toString)
    } finally q.stop()
  }

  test("snapshot read drops evicted keys (per-key max-seen would " +
      "resurrect them) and capacity guard fires") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Long)]
    val out = HeavyHitterStream.topKeys(
      input.toDF().toDF("shard", "key"), capacity = 1)
    val q = out.toDF().writeStream.format("memory")
      .queryName("hh_evict_out").outputMode("append").start()
    try {
      input.addData((0, 7L)); q.processAllAvailable()
      input.addData((0, 8L), (0, 8L)); q.processAllAvailable()
      val all = spark.table("hh_evict_out")
      // key 7 was emitted in snapshot 1 then evicted by 8
      assert(all.filter($"key" === 7L).count() === 1L)
      val snap = HeavyHitterStream.latestSnapshot(all)
        .select($"key", $"n", $"err")
        .as[(Long, Long, Long)].collect().toSeq
      assert(snap === Seq((8L, 3L, 1L)), snap.toString)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      HeavyHitterStream.topKeys(
        Seq((0, 1L)).toDF("shard", "key"), capacity = 0)
    }
  }
}
