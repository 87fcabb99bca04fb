package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd indexed read into a BROADCAST `Array[Long]` — the
  * scale-correct way to ship a large sketch (Bloom words, CMS grid)
  * into a probe expression.
  *
  * Why not `typedLit(words)`: a literal array rides the expression
  * tree into EVERY task binary as java-serialized boxed data — a
  * 2^27-bit Bloom filter (16 MB of longs) inflates to ~10× that boxed
  * and is deserialized once per task, which measurably OOMs an 8 GB
  * driver at 32 local threads (observed in the ScaleBench artifact-
  * lifecycle row) and at cluster scale re-sends the filter with every
  * task instead of once per executor. A TorrentBroadcast ships the
  * primitive array once per executor; the expression carries only the
  * broadcast HANDLE, and the generated code caches `bc.value()` in an
  * instance field — one fetch per codegen instance, an array index
  * per row.
  *
  * The hashing/probe arithmetic stays in the SAME Catalyst builtins
  * as the literal path ([[graft.operators.Bloom.probes]] — pmod,
  * xxhash64, shifts), so the two shipping modes are semantically
  * identical by construction; only the word lookup changes
  * (spec-gated equal in SketchStoreSpec). */
case class BroadcastWordGet(child: Expression, bc: Broadcast[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "broadcast_word_get"
  override def nullSafeEval(input: Any): Any =
    bc.value(input.asInstanceOf[Long].toInt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBcWords", bc,
      classOf[Broadcast[Array[Long]]].getName)
    val arr = ctx.addMutableState("long[]", "graftBcWordsArr",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $arr[(int) $c];")
  }
  override protected def withNewChildInternal(newChild: Expression): BroadcastWordGet =
    copy(child = newChild)
}

object BroadcastWords {
  /** `words(idx)` as a Column over a broadcast handle (0-based idx). */
  def wordAt(bc: Broadcast[Array[Long]], idx: Column): Column =
    GraftShims.column(BroadcastWordGet(GraftShims.expression(idx), bc))
}
