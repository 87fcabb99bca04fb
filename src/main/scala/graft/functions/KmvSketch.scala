package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch — the bounded, mergeable,
  * EXACTLY replayable cardinality/overlap sketch behind
  * [[graft.operators.Sketches]].
  *
  * Keeps the `k` smallest DISTINCT hash values seen (ascending signed
  * order). Unlike HLL (q34's `hll_sketch_agg`), the KMV state is a
  * plain sorted set of hashes, so any engine that can sort and `LIMIT k`
  * reproduces the sketch BIT-IDENTICALLY — which is what lets the
  * overlap-matrix query carry a full DuckDB hash-exact oracle instead
  * of q34's within-bound boolean gate.
  *
  * Scale shape: `update` is O(log k) against O(k) state; each map
  * partition combines its rows down to ≤ k longs per group BEFORE the
  * shuffle (partial-aggregatable), so a slice with billions of grams
  * ships ≤ k·(partitions touching it) longs — never the gram count.
  *
  * Domain contract: hash inputs must be NON-NEGATIVE (the estimator's
  * uniform-[0, 2^48) assumption; signed ascending = unsigned ascending
  * only without negatives). [[graft.operators.Sketches]] feeds it the
  * portable 48-bit md5 domain or `xxhash64 & (2^48−1)` — both qualify.
  * Null inputs contribute nothing (the SUM-ignores-NULL convention).
  * Emits the kept hashes ascending as `Array[Long]`; fewer than `k`
  * distinct inputs emit them all (the estimator's exact-count regime).
  */
case class KmvMinHashes(
    hash: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvMinHashes.Buffer]
    with ImplicitCastInputTypes {

  require(k >= 2, s"kmv_min_hashes needs k >= 2 (the estimator reads " +
    s"the k-th minimum), got $k")

  override def children: Seq[Expression] = Seq(hash)
  // analysis-time contract (the BoundedMinIds lesson): pin the child
  // type so a mistyped caller fails analysis, not executor-side in an
  // opaque update() ClassCastException
  override def inputTypes: Seq[org.apache.spark.sql.GraftShims.AbstractType] =
    Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_min_hashes"

  override def createAggregationBuffer(): KmvMinHashes.Buffer =
    new KmvMinHashes.Buffer(k)

  override def update(buf: KmvMinHashes.Buffer,
      input: InternalRow): KmvMinHashes.Buffer = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KmvMinHashes.Buffer,
      b2: KmvMinHashes.Buffer): KmvMinHashes.Buffer = {
    b2.foreach(h => b1.offer(h))
    b1
  }

  override def eval(buf: KmvMinHashes.Buffer): Any =
    new GenericArrayData(buf.sortedHashes)

  override def serialize(buf: KmvMinHashes.Buffer): Array[Byte] = {
    val hs = buf.sortedHashes
    val bb = ByteBuffer.allocate(hs.length * 8)
    hs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvMinHashes.Buffer = {
    val buf = new KmvMinHashes.Buffer(k)
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.offer(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMinHashes =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvMinHashes =
    copy(hash = c(0))
}

object KmvMinHashes {
  /** The k smallest DISTINCT longs seen: a sorted set capped at k —
    * `offer` rejects duplicates (TreeSet) and evicts the current
    * maximum once full. O(log k) per offer, O(k) state. */
  final class Buffer(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def offer(h: Long): Unit = {
      if (set.size < k) { set.add(h); () }
      else if (h < set.last()) {
        if (set.add(h)) { set.pollLast(); () }
      }
    }

    def foreach(f: Long => Unit): Unit = {
      val it = set.iterator()
      while (it.hasNext) f(it.next())
    }

    /** Ascending — position k−1 (0-based) is the k-th minimum the
      * estimator divides by. */
    def sortedHashes: Array[Long] = {
      val out = new Array[Long](set.size)
      var i = 0
      val it = set.iterator()
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  import org.apache.spark.sql.GraftShims

  /** Column API: the k smallest distinct hash values, ascending. */
  def kmvMinHashes(hash: Column, k: Int): Column =
    GraftShims.column(KmvMinHashes(GraftShims.expression(hash), k)
      .toAggregateExpression())
}
