package graft

import org.apache.spark.sql.functions._

/** [[operators.Chunking.chunkByTokens]]: window arithmetic, coverage,
  * overlap, edge docs, and the zero-shuffle plan contract. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("window count, coverage, and overlap on a 10-token doc (C=4, S=3)") {
    val d = docs((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
    val out = operators.Chunking.chunkByTokens(d, 4, 3)
      .orderBy($"chunk_idx")
      .collect()
    // 1 + ceil((10-4)/3) = 3 chunks: [1..4], [4..7], [7..10]
    assert(out.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L))
  }

  test("short doc → one chunk; blank doc → zero chunks; short final window") {
    val d = docs((1L, "a b"), (2L, "   "), (3L, ""),
      (4L, (1 to 6).map(i => s"w$i").mkString(" ")))
    val out = operators.Chunking.chunkByTokens(d, 4, 3)
      .orderBy($"doc_id", $"chunk_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq ==
      Seq((1L, "a b", 2L),
        (4L, "w1 w2 w3 w4", 4L), (4L, "w4 w5 w6", 3L)))
  }

  test("every token position is covered by at least one chunk") {
    val n = 97
    val d = docs((1L, (0 until n).map(i => s"x$i").mkString(" ")))
    val covered = operators.Chunking.chunkByTokens(d, 16, 11)
      .select(explode(split($"chunk_text", " ")).as("tok"))
      .distinct().count()
    assert(covered == n)
  }

  test("stride == chunk partitions the doc exactly (no overlap, no loss)") {
    val n = 50
    val d = docs((1L, (0 until n).map(i => s"x$i").mkString(" ")))
    val out = operators.Chunking.chunkByTokens(d, 8, 8)
      .orderBy($"chunk_idx").collect()
    val rebuilt = out.map(_.getAs[String]("chunk_text")).mkString(" ")
    assert(rebuilt == (0 until n).map(i => s"x$i").mkString(" "))
    assert(out.map(_.getAs[Long]("n_tokens")).sum == n)
  }

  test("chunking is a narrow plan: zero shuffles") {
    val plan = SparkEntry.queries("q87_chunking")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the orderBy adds one final Exchange for presentation; the chunking
    // itself must add none — check the operator directly
    val opPlan = operators.Chunking.chunkByTokens(
      Tables.documents(spark, "/root/testdata/sf0.001"), 40, 30)
      .queryExecution.executedPlan.toString
    assert(!opPlan.contains("Exchange"), opPlan)
    assert(plan.contains("Generate")) // the explode is there
  }

  test("stride/chunk bounds are validated loudly") {
    val d = docs((1L, "a b c"))
    intercept[IllegalArgumentException] {
      operators.Chunking.chunkByTokens(d, 4, 5) // stride > chunk drops tokens
    }
    intercept[IllegalArgumentException] {
      operators.Chunking.chunkByTokens(d, 4, 0)
    }
    intercept[IllegalArgumentException] {
      operators.Chunking.chunkByTokens(d, 0, 1)
    }
  }
}
