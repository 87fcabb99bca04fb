package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded "n smallest (sortKey, id) pairs" aggregate — the
  * partial-aggregatable kernel behind
  * [[graft.operators.Sampling.quotaPerKey]].
  *
  * Why an aggregate and not `row_number`: per-key top-n via a
  * `row_number` window partitioned by the key sorts EVERY row of the
  * hottest key in one reducer task — a web-scale corpus with one
  * dominant domain (billions of rows under a single key) turns that
  * into the same single-task straggler class the q70 span-dedup fix
  * removed. This aggregate instead carries at most `n` (sortKey, id)
  * pairs of state: each map partition combines its rows down to ≤ n
  * per key BEFORE the shuffle, so the bytes crossing the wire for a
  * key are O(n · partitions touching it), never O(rows of the key),
  * and no task ever sorts more than its own partition.
  *
  * Order is lexicographic ascending on (sortKey, id) — the id
  * tiebreak makes the result deterministic under any partitioning
  * even when sort keys collide. Null sortKey/id inputs contribute
  * nothing (the SUM-ignores-NULL convention). Emits the kept ids in
  * (sortKey, id) order as `Array[Long]`.
  */
case class BoundedMinIds(
    sortKey: Expression, id: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedMinIds.Buffer]
    with ImplicitCastInputTypes {

  require(n > 0, s"bounded_min_ids needs a positive bound, got $n")

  override def children: Seq[Expression] = Seq(sortKey, id)
  // analysis-time contract: both children are longs (narrower integers
  // implicitly widen) — without this, a caller handing the public
  // Column API an int/double column would pass analysis and then die
  // executor-side in update()'s asInstanceOf with an opaque CCE
  override def inputTypes: Seq[org.apache.spark.sql.GraftShims.AbstractType] =
    Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_min_ids"

  override def createAggregationBuffer(): BoundedMinIds.Buffer =
    new BoundedMinIds.Buffer(n)

  override def update(buf: BoundedMinIds.Buffer,
      input: InternalRow): BoundedMinIds.Buffer = {
    val k = sortKey.eval(input)
    val i = id.eval(input)
    if (k != null && i != null) {
      buf.offer(k.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: BoundedMinIds.Buffer,
      b2: BoundedMinIds.Buffer): BoundedMinIds.Buffer = {
    b2.foreach((k, i) => b1.offer(k, i))
    b1
  }

  override def eval(buf: BoundedMinIds.Buffer): Any =
    new GenericArrayData(buf.sortedIds)

  override def serialize(buf: BoundedMinIds.Buffer): Array[Byte] = {
    val pairs = buf.sortedPairs
    val bb = ByteBuffer.allocate(pairs.length * 16)
    pairs.foreach { case (k, i) => bb.putLong(k); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinIds.Buffer = {
    val buf = new BoundedMinIds.Buffer(n)
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.offer(bb.getLong(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedMinIds =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMinIds =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BoundedMinIds =
    copy(sortKey = c(0), id = c(1))
}

/** The ONE bounded best-n-pairs heap both aggregates retain state in:
  * `worstFirst` orders the WORST pair first (the heap root — the
  * eviction candidate), so "keep the n best" is the same three-line
  * offer for any ordering; the kept pairs emit BEST-first (the
  * reverse of `worstFirst`). O(log n) per offer, O(n) state
  * regardless of input size. */
class BoundedPairBuffer[K](n: Int,
    worstFirst: java.util.Comparator[(K, Long)]) {
  private val heap = new java.util.PriorityQueue[(K, Long)](
    math.min(n, 1024), worstFirst)

  def offer(k: K, i: Long): Unit = {
    if (heap.size < n) { heap.offer((k, i)); () }
    else if (worstFirst.compare((k, i), heap.peek()) > 0) {
      heap.poll(); heap.offer((k, i)); ()
    }
  }

  def foreach(f: (K, Long) => Unit): Unit = {
    val it = heap.iterator()
    while (it.hasNext) { val p = it.next(); f(p._1, p._2) }
  }

  def sortedPairs: Array[(K, Long)] = {
    val out = heap.toArray
    java.util.Arrays.sort(out,
      worstFirst.reversed().asInstanceOf[java.util.Comparator[AnyRef]])
    out.map(_.asInstanceOf[(K, Long)])
  }

  def sortedIds: Array[Long] = sortedPairs.map(_._2)
}

object BoundedMinIds {
  /** Holds the n LEXICOGRAPHICALLY SMALLEST (sortKey, id) pairs seen:
    * worst = largest pair; best-first output = ascending (sortKey, id). */
  final class Buffer(n: Int) extends BoundedPairBuffer[Long](n,
    (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  import org.apache.spark.sql.GraftShims

  /** Column API: the ids of the n smallest (sortKey, id) pairs. */
  def boundedMinIds(sortKey: Column, id: Column, n: Int): Column =
    GraftShims.column(BoundedMinIds(GraftShims.expression(sortKey),
      GraftShims.expression(id), n).toAggregateExpression())
}

/** Bounded "n BEST (score, id) pairs" aggregate — the
  * partial-aggregatable kernel behind
  * [[graft.operators.Sampling.topKPerKey]]: selection order is
  * `(score DESC, id ASC)`, i.e. exactly the rows
  * `row_number() OVER (PARTITION BY key ORDER BY score DESC, id)`
  * ranks ≤ n — without the window's sort-every-row-of-the-hottest-key
  * single-task straggler (see [[BoundedMinIds]]'s scale rationale;
  * this is the same plan with a double sort key and reversed order).
  *
  * Ordering contract (must match both engines' ORDER BY): doubles
  * compare via `java.lang.Double.compare` with `-0.0` normalized to
  * `0.0` on entry (SQL says `-0.0 = 0.0`; the raw IEEE compare does
  * not), so NaN ranks ABOVE +Infinity — the same "NaN is largest"
  * order Spark and DuckDB sort by. Null score or id inputs contribute
  * nothing (the SUM-ignores-NULL convention): a null score cannot be
  * ranked, so such rows are never selected. Emits the kept ids in
  * (score DESC, id ASC) order as `Array[Long]`. */
case class BoundedMaxByScore(
    score: Expression, id: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedMaxByScore.Buffer]
    with ImplicitCastInputTypes {

  require(n > 0, s"bounded_max_by_score needs a positive bound, got $n")

  override def children: Seq[Expression] = Seq(score, id)
  // analysis-time contract (the BoundedMinIds lesson): pin the child
  // types so a mistyped caller fails analysis, not executor-side in an
  // opaque update() ClassCastException. Numeric scores widen to double
  // implicitly; the id must reach here as a long.
  override def inputTypes: Seq[org.apache.spark.sql.GraftShims.AbstractType] =
    Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bounded_max_by_score"

  override def createAggregationBuffer(): BoundedMaxByScore.Buffer =
    new BoundedMaxByScore.Buffer(n)

  override def update(buf: BoundedMaxByScore.Buffer,
      input: InternalRow): BoundedMaxByScore.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: BoundedMaxByScore.Buffer,
      b2: BoundedMaxByScore.Buffer): BoundedMaxByScore.Buffer = {
    b2.foreach((s, i) => b1.offer(s, i))
    b1
  }

  override def eval(buf: BoundedMaxByScore.Buffer): Any =
    new GenericArrayData(buf.sortedIds)

  override def serialize(buf: BoundedMaxByScore.Buffer): Array[Byte] = {
    val pairs = buf.sortedPairs
    val bb = ByteBuffer.allocate(pairs.length * 16)
    pairs.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMaxByScore.Buffer = {
    val buf = new BoundedMaxByScore.Buffer(n)
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.offer(bb.getDouble(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedMaxByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMaxByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BoundedMaxByScore =
    copy(score = c(0), id = c(1))
}

/** Bounded "n best (score, id) pairs" for INTEGER scores, emitting the
  * pairs themselves — the retrieval kernel behind
  * [[graft.operators.Retrieval.bm25TopK]]: selection order
  * `(score DESC, id ASC)` like [[BoundedMaxByScore]], but the score is
  * a long (exact — quantized BM25 scores are integers by construction)
  * and the output carries it, so ranked results need NO join-back to a
  * score table (which would recompute or reshuffle the scoring
  * subtree). Emits `Array[Struct[score: Long, id: Long]]` best-first;
  * same partial-aggregatable no-window scale shape as the rest of the
  * family. Null score or id inputs contribute nothing. */
case class BoundedMaxLongPairs(
    score: Expression, id: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedMaxLongPairs.Buffer]
    with ImplicitCastInputTypes {

  require(n > 0, s"bounded_max_long_pairs needs a positive bound, got $n")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[org.apache.spark.sql.GraftShims.AbstractType] =
    Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("id", LongType,
        nullable = false))),
    containsNull = false)
  override def prettyName: String = "bounded_max_long_pairs"

  override def createAggregationBuffer(): BoundedMaxLongPairs.Buffer =
    new BoundedMaxLongPairs.Buffer(n)

  override def update(buf: BoundedMaxLongPairs.Buffer,
      input: InternalRow): BoundedMaxLongPairs.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: BoundedMaxLongPairs.Buffer,
      b2: BoundedMaxLongPairs.Buffer): BoundedMaxLongPairs.Buffer = {
    b2.foreach((s, i) => b1.offer(s, i))
    b1
  }

  override def eval(buf: BoundedMaxLongPairs.Buffer): Any =
    new GenericArrayData(buf.sortedPairs.map { case (s, i) =>
      org.apache.spark.sql.catalyst.InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: BoundedMaxLongPairs.Buffer): Array[Byte] = {
    val pairs = buf.sortedPairs
    val bb = ByteBuffer.allocate(pairs.length * 16)
    pairs.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedMaxLongPairs.Buffer = {
    val buf = new BoundedMaxLongPairs.Buffer(n)
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.offer(bb.getLong(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedMaxLongPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMaxLongPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BoundedMaxLongPairs =
    copy(score = c(0), id = c(1))
}

object BoundedMaxLongPairs {
  /** The n best (score, id) pairs by (score DESC, id ASC) — exact long
    * compares, no float normalization needed. */
  final class Buffer(n: Int) extends BoundedPairBuffer[Long](n,
    (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  import org.apache.spark.sql.GraftShims

  /** Column API: the n best (score DESC, id ASC) pairs as structs. */
  def boundedMaxLongPairs(score: Column, id: Column, n: Int): Column =
    GraftShims.column(BoundedMaxLongPairs(GraftShims.expression(score),
      GraftShims.expression(id), n).toAggregateExpression())
}

object BoundedMaxByScore {
  /** Holds the n BEST (score, id) pairs by (score DESC, id ASC):
    * worst = lowest score then highest id; `-0.0` normalizes to `0.0`
    * on every entry path (offer is the single entry — update, merge,
    * and deserialize all funnel through it) so SQL's `-0.0 = 0.0` tie
    * semantics hold where the raw IEEE compare would order them. */
  final class Buffer(n: Int) extends BoundedPairBuffer[Double](n,
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }) {
    override def offer(s: Double, i: Long): Unit =
      super.offer(if (s == 0.0d) 0.0d else s, i)
  }

  import org.apache.spark.sql.GraftShims

  /** Column API: the ids of the n best (score DESC, id ASC) pairs. */
  def boundedMaxByScore(score: Column, id: Column, n: Int): Column =
    GraftShims.column(BoundedMaxByScore(GraftShims.expression(score),
      GraftShims.expression(id), n).toAggregateExpression())
}
