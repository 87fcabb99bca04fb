package graft

import org.apache.spark.sql.functions._

/** [[operators.Bloom]] + [[operators.Dedup.decontaminateBloom]]:
  * the prune-then-verify contract — zero false negatives (exactness),
  * bounded false positives (the pruning actually prunes), and
  * bit-identical composition with the exact decontamination gate. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("no false negatives: every built key passes mightContain") {
    val keys = spark.range(5000).select(xxhash64($"id").as("h"))
    val words = operators.Bloom.buildWords(keys, "h", 1 << 17)
    val pass = keys.filter(operators.Bloom.mightContain($"h", words)).count()
    assert(pass == 5000L)
  }

  test("false-positive rate on disjoint keys is small (the filter prunes)") {
    // 5k keys in 2^17 bits ≈ 26 bits/key at 3 probes → theoretical fp
    // ≈ 0.1%; assert an order of magnitude of slack
    val keys = spark.range(5000).select(xxhash64($"id").as("h"))
    val words = operators.Bloom.buildWords(keys, "h", 1 << 17)
    val probe = spark.range(1000000, 1020000)
      .select(xxhash64($"id").as("h"))
    val fp = probe.filter(operators.Bloom.mightContain($"h", words)).count()
    assert(fp < 400, s"fp=$fp of 20000 — filter not pruning")
  }

  test("decontaminateBloom ≡ decontaminate (the Bloom is invisible in the result)") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val bench = docs.filter($"doc_id" % 10 === 0)
    val exact = operators.Dedup.decontaminate(corpus, bench, n = 6)
      .select($"doc_id").as[Long].collect().sorted
    val bloomed = operators.Dedup.decontaminateBloom(corpus, bench, n = 6,
      numBits = 1 << 14)
    // deliberately UNDERSIZED filter (high fp) — exactness must not
    // depend on the fp rate, only volume does
    val got = bloomed.select($"doc_id").as[Long].collect().sorted
    assert(got.sameElements(exact))
    // something survived and something was dropped, or the gate proves
    // nothing at this SF
    assert(got.nonEmpty && got.length < corpus.count())
  }

  test("buildWords validates its bounds loudly") {
    val keys = spark.range(10).select(xxhash64($"id").as("h"))
    intercept[IllegalArgumentException] {
      operators.Bloom.buildWords(keys, "h", 100) // not a multiple of 64
    }
    intercept[IllegalArgumentException] {
      operators.Bloom.buildWords(keys, "h", operators.Bloom.MaxBits * 2)
    }
    intercept[IllegalArgumentException] {
      operators.Bloom.buildWords(keys, "h", 1 << 10, numHashes = 0)
    }
  }

  test("null hashes: dropped at build, not-contained at test (symmetric)") {
    val keys = spark.range(1000)
      .select(when($"id" % 10 === 0, lit(null).cast("long"))
        .otherwise(xxhash64($"id")).as("h"))
    val f = operators.Bloom.buildWords(keys, "h", 1 << 14)
    // build didn't NPE and every NON-null key still passes
    val pass = keys.filter(operators.Bloom.mightContain($"h", f)).count()
    assert(pass == 900L)
    // a null test-side hash is not-contained, mirroring the build drop
    val nullRow = Seq[Option[Long]](None).toDF("h")
    assert(nullRow.filter(operators.Bloom.mightContain($"h", f)).count() == 0L)
  }

  test("membership is pure codegen'd builtins — no UDF in the plan") {
    val keys = spark.range(100).select(xxhash64($"id").as("h"))
    val words = operators.Bloom.buildWords(keys, "h", 1 << 10)
    val plan = spark.range(1000).select(xxhash64($"id").as("h"))
      .filter(operators.Bloom.mightContain($"h", words))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }
}
