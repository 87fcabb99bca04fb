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
