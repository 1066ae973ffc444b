package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Aggregate that scatters (loc, value) observations straight into a dense
 * NaN-initialized Array[Double] of the index size — the reference's
 * per-partition densify loop (TimeSeriesRDD.scala:716-744) as a native
 * Catalyst TypedImperativeAggregate (the perf path SURVEY §7.3 earmarks for
 * exactly this: series gathering without collect_list overhead).
 *
 * The buffer merges associatively (non-NaN wins), so Catalyst runs it as
 * partial + final aggregation with map-side combine — the array, not the
 * observation structs, crosses the shuffle.
 */
case class ScatterToSeries(
    loc: Expression,
    value: Expression,
    size: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(loc, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "scatter_to_series"

  override def createAggregationBuffer(): Array[Double] =
    Array.fill(size)(Double.NaN)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val l = loc.eval(input)
    val v = value.eval(input)
    if (l != null) {
      val i = l.asInstanceOf[Number].intValue()
      if (i >= 0 && i < size) {
        buffer(i) = if (v == null) Double.NaN else v.asInstanceOf[Number].doubleValue()
      }
    }
    buffer
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) {
      if (!b2(i).isNaN) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  // r22: unboxed container (GenericArrayData(double[]) boxes per element);
  // one conversion per GROUP, but series can be 10^4+ slots wide
  override def eval(buffer: Array[Double]): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ScatterToSeries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScatterToSeries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ScatterToSeries =
    copy(loc = newChildren(0), value = newChildren(1))
}

object ScatterToSeries {
  /** Column API: scatter_to_series(loc, value, indexSize) as an aggregate. */
  def apply(loc: Column, value: Column, size: Int): Column =
    GraftSqlBridge.column(
      ScatterToSeries(GraftSqlBridge.expression(loc),
        GraftSqlBridge.expression(value), size).toAggregateExpression())
}
