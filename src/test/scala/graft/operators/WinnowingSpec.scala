package graft.operators

import graft.SparkSpec

/** [[Winnowing]]: selection equivalence against an independent JVM
  * reference implementation, the detection guarantee the algorithm is
  * chosen for, the full-window/short-doc contract, and hot-bucket
  * degradation on the pair join. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val W = 4

  /** Independent reference: same hash ([[Sampling.portableHash48Jvm]]
    * — Column-form equivalence is pinned in PropertySpec), selection
    * re-derived from the paper's definition (min of each full window,
    * ties to the rightmost position) with plain collections. */
  private def reference(text: String): Set[(Int, Long)] = {
    val toks = text.trim.split("\\s+").toSeq
    if (toks.size < K + W - 1) return Set.empty
    val hs = toks.sliding(K).map(_.mkString(" "))
      .map(s => Sampling.portableHash48Jvm(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .toVector
    (0 to hs.size - W).flatMap { s =>
      val win = hs.slice(s, s + W)
      val m = win.min
      val pos = s + win.lastIndexOf(m) + 1 // 1-based shingle position
      Some((pos, m))
    }.toSet
  }

  test("selection ≡ the JVM reference on seeded pseudo-random docs " +
      "over a small alphabet (repeats force real window ties)") {
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("aa", "bb", "cc", "dd")
    val docs = (1L to 20L).map { i =>
      val n = 6 + rnd.nextInt(40)
      (i, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val got = Winnowing.fingerprints(docs.toDF("doc_id", "text"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === reference(text),
        s"doc $id: '$text'")
    }
  }

  test("detection guarantee: a shared run of w+k-1 tokens yields a " +
      "shared fingerprint; density stays under the full shingle set") {
    val rnd = new scala.util.Random(11)
    def words(n: Int) = Seq.fill(n)("t" + rnd.nextInt(1000000))
    val shared = words(W + K - 1) // exactly the guarantee length
    val a = (words(20) ++ shared ++ words(20)).mkString(" ")
    val b = (words(17) ++ shared ++ words(23)).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Winnowing.sharedPairs(docs, minShared = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)), pairs.toString)
    // density: far fewer selected positions than shingles (the index
    // the detector stores is the point of winnowing)
    val nFps = Winnowing.fingerprints(docs).count()
    val nShingles = (20 + 20 + 17 + 23 + 2 * shared.size) - 2 * (K - 1)
    assert(nFps < nShingles / 2, s"$nFps vs $nShingles")
  }

  test("full-window contract: docs under w+k-1 tokens emit nothing; " +
      "exactly w+k-1 tokens emit exactly one fingerprint") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e f"),
      (3L, null: String), (4L, "")).toDF("doc_id", "text")
    val got = Winnowing.fingerprints(docs)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got.map(_._1).distinct === Seq(2L), got.toString)
    assert(got.size === 1, got.toString) // one full window, one min
  }

  test("evalOverlap flags a training doc carrying an eval span — " +
      "including a REORDERED partial copy — and spares clean docs") {
    val rnd = new scala.util.Random(13)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(1000000))
    val secA = words(10); val secB = words(10)
    val evalDoc = (1L, (secA ++ secB).mkString(" "))
    val verbatim = (10L, (words(15) ++ secA ++ words(15)).mkString(" "))
    // reordered copy: eval sections in the REVERSE order, split by
    // fresh text — no long verbatim run of the ORIGINAL doc, but each
    // section exceeds w+k-1 tokens, so winnowing still catches it
    val reordered = (11L, (words(8) ++ secB ++ words(8) ++ secA)
      .mkString(" "))
    val clean = (12L, words(40).mkString(" "))
    val train = Seq(verbatim, reordered, clean).toDF("doc_id", "text")
    val ev = Seq(evalDoc).toDF("doc_id", "text")
    val got = Winnowing.evalOverlap(train, ev, minShared = 1)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(10L, 11L), got.toString)
    assert(got.values.forall(_ >= 1L))
  }

  test("fingerprint index round-trip: evalOverlapFromIndex ≡ " +
      "evalOverlap; stamp mismatches (k, w, kind, torn meta) fail " +
      "fast instead of reading 'clean'") {
    val rnd = new scala.util.Random(29)
    def words(n: Int) = Seq.fill(n)("v" + rnd.nextInt(1000000))
    val sec = words(12)
    val ev = Seq((1L, (words(5) ++ sec).mkString(" ")),
      (2L, words(20).mkString(" "))).toDF("doc_id", "text")
    val train = Seq(
      (10L, (words(10) ++ sec ++ words(10)).mkString(" ")),
      (11L, words(30).mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_idx").toString
    try {
      Winnowing.writeFingerprintIndex(ev, s"$dir/idx")
      val direct = Winnowing.evalOverlap(train, ev, minShared = 1)
        .as[(Long, Long)].collect().toSet
      val viaIdx = Winnowing
        .evalOverlapFromIndex(train, s"$dir/idx", minShared = 1)
        .as[(Long, Long)].collect().toSet
      assert(direct === viaIdx)
      assert(viaIdx.map(_._1) === Set(10L))
      // the persisted set is exactly the eval side's distinct
      // fingerprints
      val fps = Winnowing.readFingerprintIndex(spark, s"$dir/idx")
        .as[Long].collect().toSet
      val expect = Winnowing.fingerprints(ev)
        .select($"fp").as[Long].collect().toSet
      assert(fps === expect)
      // cross-domain probes fail FAST (k, then w) — zero overlap
      // would otherwise read as "clean"
      val ek = intercept[IllegalArgumentException] {
        Winnowing.readFingerprintIndex(spark, s"$dir/idx", k = 4)
      }
      assert(ek.getMessage.contains("fingerprint domain"), ek.getMessage)
      intercept[IllegalArgumentException] {
        Winnowing.evalOverlapFromIndex(train, s"$dir/idx", w = 5)
      }
      // a REBUILD with different dials atomically replaces BOTH fps
      // and stamp (staged + swapped): the new read works, the old
      // dials now fail fast — no window where the old stamp covers
      // new fingerprints
      Winnowing.writeFingerprintIndex(ev, s"$dir/idx", k = 4)
      assert(Winnowing.readFingerprintIndex(spark, s"$dir/idx", k = 4)
        .count() > 0)
      intercept[IllegalArgumentException] {
        Winnowing.readFingerprintIndex(spark, s"$dir/idx") // k = 3
      }
      // a wrong-kind artifact at the same layout fails on the stamp
      Winnowing.writeFingerprintIndex(ev, s"$dir/idx2")
      import org.apache.spark.sql.SaveMode
      Seq((1L, "bloom", Winnowing.indexDomain(3, 4)))
        .toDF("version", "kind", "domain")
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/idx2/meta")
      val ekind = intercept[IllegalArgumentException] {
        Winnowing.readFingerprintIndex(spark, s"$dir/idx2")
      }
      assert(ekind.getMessage.contains("expected 'winnow_fps'"),
        ekind.getMessage)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("appendToFingerprintIndex ≡ rebuild on the doc-set union; the " +
      "appended index flags what only the NEW suite can flag; a " +
      "cross-domain append fails fast before touching the artifact") {
    val rnd = new scala.util.Random(47)
    def words(n: Int) = Seq.fill(n)("a" + rnd.nextInt(1000000))
    val secOld = words(12); val secNew = words(12)
    val evalOld = Seq((1L, (words(5) ++ secOld).mkString(" ")),
      (2L, words(20).mkString(" "))).toDF("doc_id", "text")
    val evalNew = Seq((3L, (secNew ++ words(5)).mkString(" ")))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, (words(8) ++ secOld ++ words(8)).mkString(" ")),
      (11L, (words(8) ++ secNew ++ words(8)).mkString(" ")),
      (12L, words(30).mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winnow_append").toString
    try {
      Winnowing.writeFingerprintIndex(evalOld, s"$dir/idx")
      // before the append: only the old suite's copy is flagged
      assert(Winnowing
        .evalOverlapFromIndex(train, s"$dir/idx", minShared = 1)
        .as[(Long, Long)].collect().toMap.keySet === Set(10L))
      Winnowing.appendToFingerprintIndex(evalNew, s"$dir/idx")
      // append ≡ rebuild on the union, fingerprint-set-exact
      Winnowing.writeFingerprintIndex(evalOld.unionByName(evalNew),
        s"$dir/rebuilt")
      val appended = Winnowing.readFingerprintIndex(spark, s"$dir/idx")
        .as[Long].collect().toSet
      val rebuilt = Winnowing.readFingerprintIndex(spark, s"$dir/rebuilt")
        .as[Long].collect().toSet
      assert(appended === rebuilt)
      // and behavior-exact: the new suite's copy is now flagged too
      assert(Winnowing
        .evalOverlapFromIndex(train, s"$dir/idx", minShared = 1)
        .as[(Long, Long)].collect().toMap.keySet === Set(10L, 11L))
      // appending with the WRONG dials dies on the stamp check and
      // leaves the artifact untouched (k=4 fps unioned into a k=3 set
      // would be silent false negatives)
      intercept[IllegalArgumentException] {
        Winnowing.appendToFingerprintIndex(evalNew, s"$dir/idx", k = 4)
      }
      assert(Winnowing.readFingerprintIndex(spark, s"$dir/idx")
        .as[Long].collect().toSet === rebuilt,
        "a rejected append must not mutate the index")
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  test("pair join degrades oversized fingerprint buckets to star " +
      "pairs instead of enumerating them") {
    // 5 identical docs: every selected fingerprint is shared 5 ways
    val docs = (1L to 5L).map((_, "x y z x y z x y"))
      .toDF("doc_id", "text")
    val full = Winnowing.sharedPairs(docs, minShared = 1)
    assert(full.count() === 10L) // C(5,2): cap not hit
    val starred = Winnowing.sharedPairs(docs, minShared = 1,
      maxBucket = 2)
    // star candidates: min-id representative joins the others
    assert(starred.as[(Long, Long, Long)].collect().toSeq
      .map(p => (p._1, p._2)).sorted ===
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)))
  }
}
