package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingler.
  *
  * The composable form (`split` → `transform(sequence)` → `slice` →
  * `concat_ws` → `array_distinct`) runs as interpreted higher-order
  * functions: measured ~6 s for 5 000 docs — it dominated every
  * dedup query. This expression computes the distinct shingle set in
  * one pass over the string (~20× less overhead), with identical
  * semantics: tokens = trimmed whitespace split; if fewer than n
  * tokens, one shingle of all tokens; first-occurrence order.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Shared kernel for interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    val m = math.max(toks.length - n, 0)
    val seen = new java.util.LinkedHashSet[String]((m + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def shinglesNative(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(WordShingles(GraftShims.expression(text), n))
  }
}

/** Native POSITIONAL window hasher — the exact-substring family's
  * kernel ([[graft.operators.Dedup.exactSubstringSpans]] /
  * `dedupExactSubstrings`): xxhash64 (seed 42, Spark's `xxhash64`
  * value on the same string) of EVERY n-token window, one Long per
  * start position, in document order — NOT distinct (positions must
  * align with token offsets; a repeated window inside one doc is two
  * occurrences). Fewer than n tokens → EMPTY array (the caller's
  * token-floor semantics — unlike [[WordShingles]]' one-short-shingle
  * rule, a short doc simply starts no window).
  *
  * Exists for the same reason [[WordShingles]] does: the composable
  * form (`transform(sequence) → slice → array_join → xxhash64`) runs
  * as interpreted higher-order functions — the 64× octave measured
  * the q152 shape at 375 s where the equivalent native-kernel
  * decontaminate explode ran in 9 s on the same corpus. One pass per
  * row, no intermediate window-string array crosses the row boundary
  * (only the 8-byte hashes). */
case class WindowHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowHashes$$.MODULE$$.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  /** Shared kernel for interpreted eval and generated code. Hash =
    * `XXH64.hashUnsafeBytes(utf8(window), seed = 42)` — bit-identical
    * to Spark's `xxhash64(lit(window))`, so the migration from the
    * composable form could be (and was) verified by byte-diffing the
    * query outputs. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n
    val out = new Array[Any](m + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def windowHashesNative(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(WindowHashes(GraftShims.expression(text), n))
  }
}
