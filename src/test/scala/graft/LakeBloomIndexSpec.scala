package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._

/** [[Lake.buildBloomIndex]] / [[Lake.readWithBloomIndex]]: lookup ≡
  * the full-scan filter (the no-false-negatives contract), real file
  * pruning on a key-clustered layout, the multi-file scatter case,
  * absent/null keys, unindexed null data keys, and the loud stamp /
  * staleness failures. */
class LakeBloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def scratch(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  private def cleanup(base: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }

  test("lookup ≡ full-scan filter for every key; clustered layout " +
      "prunes; scattered layout still answers exactly") {
    val base = scratch("blidx")
    try {
      val rows = (1L to 2000L).map(i => (i, i % 40, s"v$i"))
      // clustered: each key in exactly one of 8 files
      rows.toDF("id", "key", "payload").repartition(8, $"key")
        .write.parquet(s"$base/clustered")
      // scattered: the same key's rows spread across files
      rows.toDF("id", "key", "payload").repartition(8, $"id")
        .write.parquet(s"$base/scattered")
      for (layout <- Seq("clustered", "scattered")) {
        Lake.buildBloomIndex(spark, s"$base/$layout", "key",
          s"$base/idx_$layout", numBits = 1 << 12, numHashes = 5)
        for (k <- Seq(0L, 7L, 39L)) {
          val got = Lake.readWithBloomIndex(spark, s"$base/$layout",
              s"$base/idx_$layout", "key", k)
            .as[(Long, Long, String)].collect().toSet
          val want = rows.filter(_._2 == k).toSet
          assert(got === want, s"$layout key $k")
        }
      }
      // the clustered layout must actually skip files
      val cand = Lake.bloomIndexCandidateFiles(spark,
        s"$base/clustered", s"$base/idx_clustered", "key", 7L)
      val total = spark.read.parquet(s"$base/clustered")
        .inputFiles.length
      assert(cand.size < total, s"${cand.size}/$total")
    } finally cleanup(base)
  }

  test("absent key and null value return empty with the data schema; " +
      "null data keys are not indexed but real keys still resolve") {
    val base = scratch("blidx_nulls")
    try {
      Seq((1L, java.lang.Long.valueOf(5L)), (2L, null: java.lang.Long),
          (3L, java.lang.Long.valueOf(9L)))
        .toDF("id", "key").repartition(2)
        .write.parquet(s"$base/data")
      Lake.buildBloomIndex(spark, s"$base/data", "key", s"$base/idx",
        numBits = 64, numHashes = 2)
      val absent = Lake.readWithBloomIndex(spark, s"$base/data",
        s"$base/idx", "key", 123456789L)
      assert(absent.columns.toSeq === Seq("id", "key"))
      assert(absent.count() === 0L)
      assert(Lake.bloomIndexCandidateFiles(spark, s"$base/data",
        s"$base/idx", "key", null).isEmpty)
      assert(Lake.readWithBloomIndex(spark, s"$base/data",
        s"$base/idx", "key", 9L).as[(Long, Long)].collect().toSeq ===
        Seq((3L, 9L)))
    } finally cleanup(base)
  }

  test("serve-many handle: one load answers every key exactly; the " +
      "driver-load bound refuses an oversized index") {
    val base = scratch("blidx_handle")
    try {
      val rows = (1L to 500L).map(i => (i, i % 10))
      rows.toDF("id", "key").repartition(4, $"key")
        .write.parquet(s"$base/data")
      Lake.buildBloomIndex(spark, s"$base/data", "key", s"$base/idx",
        numBits = 1 << 10, numHashes = 5)
      val idx = Lake.loadBloomIndex(spark, s"$base/data", s"$base/idx",
        "key")
      for (k <- 0L until 10L) {
        val got = idx.read(k).as[(Long, Long)].collect().toSet
        assert(got === rows.filter(_._2 == k).toSet, s"key $k")
      }
      assert(idx.candidateFiles(777L).isEmpty ||
        idx.read(777L).count() === 0L) // absent key: fp-tolerant, exact
    } finally cleanup(base)
  }

  test("append: new files indexed ≡ full rebuild (word-for-word); " +
      "lookups stay exact across old and new keys; no-op, wrong-key, " +
      "and ghost appends are refused loudly") {
    val base = scratch("blidx_append")
    try {
      val rows1 = (1L to 1000L).map(i => (i, i % 40))
      rows1.toDF("id", "key").repartition(4, $"key")
        .write.parquet(s"$base/data")
      Lake.buildBloomIndex(spark, s"$base/data", "key", s"$base/idx",
        numBits = 1 << 12, numHashes = 5)
      // a no-op append means the caller's premise (new data landed)
      // is wrong — refused, not silently succeeded
      val noop = intercept[IllegalArgumentException] {
        Lake.appendBloomIndex(spark, s"$base/data", "key", s"$base/idx")
      }
      assert(noop.getMessage.contains("already current"), noop.getMessage)
      // a new batch lands: keys 40..49 exist ONLY in the new files
      val rows2 = (2001L to 2500L).map(i => (i, 40 + i % 10))
      rows2.toDF("id", "key").repartition(2, $"key")
        .write.mode("append").parquet(s"$base/data")
      intercept[IllegalArgumentException] { // plain reader: stale
        Lake.readWithBloomIndex(spark, s"$base/data", s"$base/idx",
          "key", 5L)
      }
      Lake.appendBloomIndex(spark, s"$base/data", "key", s"$base/idx")
      // append ≡ rebuild-on-union: the WORDS TABLES are identical
      // row-for-row (per-file words are independent, bit_or is
      // order-free), not just lookup-equivalent
      Lake.buildBloomIndex(spark, s"$base/data", "key", s"$base/idx2",
        numBits = 1 << 12, numHashes = 5)
      val a = spark.read.parquet(s"$base/idx/words")
        .as[(String, Int, Long)].collect().toSet
      val b = spark.read.parquet(s"$base/idx2/words")
        .as[(String, Int, Long)].collect().toSet
      assert(a === b)
      val all = rows1 ++ rows2
      for (k <- Seq(5L, 39L, 45L)) {
        val got = Lake.readWithBloomIndex(spark, s"$base/data",
            s"$base/idx", "key", k)
          .select($"id", $"key").as[(Long, Long)].collect().toSet
        assert(got === all.filter(_._2 == k).toSet, s"key $k")
      }
      // appending under the wrong key column would poison the index
      val wrong = intercept[IllegalArgumentException] {
        Lake.appendBloomIndex(spark, s"$base/data", "id", s"$base/idx")
      }
      assert(wrong.getMessage.contains("wrong index"), wrong.getMessage)
      // a ghost (data shrank under the index) is rebuild territory —
      // a fresh new file must not mask it
      val fs = new org.apache.hadoop.fs.Path(s"$base/data")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val one = spark.read.parquet(s"$base/data").inputFiles.head
      fs.delete(new org.apache.hadoop.fs.Path(
        new java.net.URI(one).getPath), false)
      Seq((9999L, 7L)).toDF("id", "key").coalesce(1)
        .write.mode("append").parquet(s"$base/data")
      val ghost = intercept[IllegalArgumentException] {
        Lake.appendBloomIndex(spark, s"$base/data", "key", s"$base/idx")
      }
      assert(ghost.getMessage.contains("ghost"), ghost.getMessage)
    } finally cleanup(base)
  }

  test("staleness and stamp mismatches fail loudly: appended file, " +
      "removed file, wrong key column") {
    val base = scratch("blidx_stale")
    try {
      Seq((1L, 5L)).toDF("id", "key").coalesce(1)
        .write.parquet(s"$base/data")
      Lake.buildBloomIndex(spark, s"$base/data", "key", s"$base/idx",
        numBits = 64, numHashes = 2)
      // wrong key column — the wrong index for the probe
      val wrongKey = intercept[IllegalArgumentException] {
        Lake.bloomIndexCandidateFiles(spark, s"$base/data",
          s"$base/idx", "id", 1L)
      }
      assert(wrongKey.getMessage.contains("wrong index"),
        wrongKey.getMessage)
      // appended data file → unindexed → loud
      Seq((2L, 6L)).toDF("id", "key").coalesce(1)
        .write.mode("append").parquet(s"$base/data")
      val stale = intercept[IllegalArgumentException] {
        Lake.readWithBloomIndex(spark, s"$base/data", s"$base/idx",
          "key", 5L)
      }
      assert(stale.getMessage.contains("STALE"), stale.getMessage)
      // rebuild, then REMOVE a file → indexed ghost → loud
      Lake.buildBloomIndex(spark, s"$base/data", "key", s"$base/idx",
        numBits = 64, numHashes = 2)
      val fs = new org.apache.hadoop.fs.Path(s"$base/data")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val one = spark.read.parquet(s"$base/data").inputFiles.head
      fs.delete(new org.apache.hadoop.fs.Path(
        new java.net.URI(one).getPath), false)
      val ghost = intercept[IllegalArgumentException] {
        Lake.bloomIndexCandidateFiles(spark, s"$base/data",
          s"$base/idx", "key", 5L)
      }
      assert(ghost.getMessage.contains("STALE"), ghost.getMessage)
    } finally cleanup(base)
  }
}
