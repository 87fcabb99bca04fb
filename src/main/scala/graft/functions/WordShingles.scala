package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The ONE tokenization every native text kernel must share with the
  * composable column form `split(trim(text), "\\s+")`
  * ([[TextFunctions.tokens]]) — the exact-substring family joins
  * kernel-produced window POSITIONS against a `tokens()`-built token
  * table ([[graft.operators.Dedup.dedupExactSubstrings]]), so any
  * divergence shifts which tokens get cut. Two traps if written
  * casually as `s.trim.split("\\s+")`:
  *
  *  - SQL `trim` strips ASCII space (U+0020) ONLY; Java `String.trim`
  *    strips every char <= U+0020 (tab, CR, LF, NUL...). A doc with a
  *    leading tab keeps a leading EMPTY token under SQL semantics
  *    (`split` sees the tab and cuts before it) — Java trim eats the
  *    tab and the whole position axis shifts left by one.
  *  - Spark's `split(str, regex)` is `StringSplit(..., limit = -1)` —
  *    trailing empty tokens are KEPT (`"a\n"` → `["a", ""]`);
  *    Java's `String.split(regex)` is limit 0 and drops them.
  */
object CanonicalTokens {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** `split(trim(s), "\\s+")` with Spark SQL semantics, on a JVM
    * String. Total: never null, `[""]` for empty/all-space input
    * (same as the SQL form). */
  def tokenize(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    WS.split(s.substring(b, e), -1)
  }
}

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
  /** Shared kernel for interpreted eval and generated code.
    * Tokenization = [[CanonicalTokens.tokenize]] (SQL
    * `split(trim(..))` semantics — see its scaladoc for why Java
    * `String.trim` is NOT equivalent). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = CanonicalTokens.tokenize(text.toString)
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
    * query outputs.
    *
    * Tokenization = [[CanonicalTokens.tokenize]] — POSITIONAL
    * agreement with the `tokens()`-built token table that
    * `dedupExactSubstrings` joins against is load-bearing here (a
    * Java-trim kernel shifts every window start left by one on a
    * doc with a leading tab/newline, cutting the WRONG tokens). */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = CanonicalTokens.tokenize(text.toString)
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

/** Native one-pass winnowing selector — the
  * [[graft.operators.Winnowing.fingerprints]] kernel: per k-token
  * shingle, the portable 48-bit md5 hash
  * ([[graft.operators.Sampling.portableHash48Jvm]] — bit-identical to
  * the Column form and DuckDB's `md5_number_upper & (2^48-1)`, the
  * PropertySpec-pinned equivalence); then from every window of `w`
  * consecutive hashes the RIGHTMOST minimum, deduplicated to distinct
  * (pos, fp) pairs IN the row. Output: array<struct<pos int, fp
  * long>>, pos 1-based — exactly the rows the composable form
  * (posexplode(transform(sequence…slice…)) → per-doc window frame →
  * distinct) produced, with NO shuffle at all: the HOF projection,
  * the per-doc window sort, and the distinct each cost a pass there
  * (the WordShingles/WindowHashes lesson a third time — interpreted
  * higher-order functions plus a window shuffle for an in-row
  * computation). Fewer than k + w − 1 tokens → empty array (below the
  * detection-guarantee length; the old filter's semantics).
  *
  * Selection is O(tokens) via a monotonic deque: push position j
  * after popping every back entry with hash ≥ h(j) (ties pop, so
  * among equal hashes the RIGHTMOST survives — standard winnowing's
  * tie rule), pop the front when it leaves the window; the front is
  * each window's rightmost minimum. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("fp",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowSelect$$.MODULE$$.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  /** Shared kernel for interpreted eval and generated code.
    * Tokenization = [[CanonicalTokens.tokenize]] (SQL `split(trim(..))`
    * semantics — the positional contract every text kernel shares). */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = CanonicalTokens.tokenize(text.toString)
    if (toks.length < k + w - 1)
      return new GenericArrayData(Array.empty[Any])
    val nsh = toks.length - (k - 1)
    val h = new Array[Long](nsh)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nsh) {
      sb.setLength(0)
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      // digest() resets the instance — one MessageDigest per row
      h(i) = graft.operators.Sampling.le48(
        md.digest(sb.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    // rightmost-min per window via a monotonic deque. Dedup needs no
    // set: fp is a function of pos (fp = h(pos)), and the selected
    // position sequence is NON-DECREASING as the window slides (a
    // selection change can only move right — the old pick either
    // leaves the window or is beaten by a new, necessarily
    // later-positioned element), so distinct (pos, fp) = "emit when
    // the selected position changes", in increasing-pos order.
    val sels = new Array[Int](nsh - w + 1)
    var nSel = 0
    var lastSel = -1
    val deque = new Array[Int](nsh)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nsh) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      val start = i - w + 1 // window [start, i] complete once start >= 0
      while (deque(head) < start) head += 1
      if (start >= 0 && deque(head) != lastSel) {
        lastSel = deque(head)
        sels(nSel) = lastSel
        nSel += 1
      }
      i += 1
    }
    val out = new Array[Any](nSel)
    var o = 0
    while (o < nSel) {
      out(o) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](sels(o) + 1, h(sels(o))))
      o += 1
    }
    new GenericArrayData(out)
  }

  def winnowSelectNative(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.column(WinnowSelect(GraftShims.expression(text), k, w))
  }
}
