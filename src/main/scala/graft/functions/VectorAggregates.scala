package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native ELEMENTWISE vector-sum aggregate — the aggregation gap in
  * Spark's surface: there is no built-in that sums `Array[Double]`
  * columns element by element, so the composable form is
  * `posexplode → groupBy(key, pos) → sum → re-collect`, which pays a
  * dim× row blowup through the shuffle (64× here) plus a second
  * aggregate to reassemble.
  *
  * This aggregate keeps one decimal accumulator per element inside the
  * aggregation buffer: one input row = one tight loop, no explode, no
  * reassembly. Each element is rounded double→decimal(scale 15,
  * HALF_UP) exactly like Spark's `cast(x AS DECIMAL(30,15))`, and
  * decimal addition is exact and commutative — so the result is
  * BIT-IDENTICAL under any partitioning, shuffle-fetch order, or
  * retry, which is the property [[graft.operators.Similarity
  * .kmeansCentroids]] needs for run-to-run deterministic codebooks
  * (double summation order follows shuffle order — a plain double
  * vector sum would make trained centroids partitioning-dependent).
  *
  * Emitted as `Array[Double]` (each exact decimal sum → double, the
  * same conversion as `CAST(decimal AS DOUBLE)`).
  */
case class VectorDecimalSum(
    child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[JBigDecimal]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_decimal_sum"

  override def createAggregationBuffer(): Array[JBigDecimal] =
    Array.fill(dim)(JBigDecimal.ZERO)

  override def update(buf: Array[JBigDecimal],
      input: InternalRow): Array[JBigDecimal] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // fail FAST on a shape mismatch: silently clamping a mis-sized
      // vector would fold a corrupt row into the mean undetected (a
      // k-means codebook poisoned by one bad row is far harder to
      // debug than an aggregate error naming it)
      require(arr.numElements() == dim,
        s"vector_decimal_sum(dim=$dim) got a ${arr.numElements()}-element vector")
      var i = 0
      while (i < dim) {
        // null elements contribute nothing — the elementwise analogue
        // of SUM ignoring NULL
        if (!arr.isNullAt(i)) {
          buf(i) = buf(i).add(JBigDecimal.valueOf(arr.getDouble(i))
            .setScale(15, RoundingMode.HALF_UP))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[JBigDecimal],
      b2: Array[JBigDecimal]): Array[JBigDecimal] = {
    var i = 0
    while (i < dim) { b1(i) = b1(i).add(b2(i)); i += 1 }
    b1
  }

  override def eval(buf: Array[JBigDecimal]): Any =
    new GenericArrayData(buf.map(_.doubleValue()))

  override def serialize(buf: Array[JBigDecimal]): Array[Byte] =
    buf.map(_.toPlainString).mkString(",")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): Array[JBigDecimal] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (s.isEmpty) createAggregationBuffer()
    else s.split(",", -1).map(new JBigDecimal(_))
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorDecimalSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorDecimalSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): VectorDecimalSum = copy(child = c(0))
}

object VectorAggregates {
  import org.apache.spark.sql.GraftShims

  /** Column API: exact elementwise sum of a double-array column. */
  def vectorDecimalSum(v: Column, dim: Int): Column =
    GraftShims.column(
      VectorDecimalSum(GraftShims.expression(v), dim).toAggregateExpression())

  /** SQL registration: `SELECT vector_decimal_sum(vec, 64)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_decimal_sum",
      exprs => VectorDecimalSum(exprs(0),
        exprs(1).eval(InternalRow.empty).asInstanceOf[Int]),
      "scala_udf")
}
