package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftExpressionBridge}

/**
 * Element-wise max over fixed-length `array<tinyint>` register vectors —
 * the HyperLogLog UNION as an aggregate: `register_max(regs)` folds a
 * group's register arrays into one array holding the per-slot maximum,
 * which is exactly the sketch of the union of the underlying sets.
 *
 * WHY an aggregate and not `collect_list` + a fold: the HyperBall superstep
 * unions each vertex's counter with ALL its neighbors' counters; a hub
 * vertex in a web graph has 10⁶⁺ in-neighbors, and collecting its group's
 * arrays before folding materializes 10⁶ × m bytes on one reducer. This
 * TypedImperativeAggregate runs as an ObjectHashAggregate with map-side
 * partial aggregation: every task folds its slice into ONE m-byte buffer,
 * partials merge associatively (max is commutative/idempotent), and the
 * shuffle carries one m-byte row per (task, vertex) — hub skew is absorbed
 * before it crosses the wire, the same design as [[TopKByScore]].
 *
 * NULL inputs are skipped; an empty group evals to NULL. All non-null
 * arrays in one aggregation must share a length (register count is a build
 * parameter, not data) — a mismatch fails loudly rather than silently
 * truncating a sketch.
 */
case class RegisterMax(regs: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(regs)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "register_max"

  override def checkInputDataTypes(): TypeCheckResult = regs.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"register_max expects array<tinyint>, got $other")
  }

  // null = "no rows seen yet"; the first input sizes the buffer
  override def createAggregationBuffer(): Array[Byte] = null

  private def maxInto(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (buffer == null) other.clone()
    else {
      require(buffer.length == other.length,
        s"register_max: mixed register counts ${buffer.length} vs ${other.length}")
      var i = 0
      while (i < buffer.length) {
        if (other(i) > buffer(i)) buffer(i) = other(i)
        i += 1
      }
      buffer
    }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = regs.eval(input)
    if (v == null) buffer
    else maxInto(buffer, v.asInstanceOf[ArrayData].toByteArray())
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other == null) buffer else maxInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any =
    if (buffer == null) null
    else new GenericArrayData(buffer.map(b => b: Any))

  override def serialize(buffer: Array[Byte]): Array[Byte] = {
    if (buffer == null) Array(0, 0, 0, 0)
    else {
      val bb = ByteBuffer.allocate(4 + buffer.length)
      bb.putInt(buffer.length)
      bb.put(buffer)
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    if (n == 0) null
    else {
      val out = new Array[Byte](n)
      bb.get(out)
      out
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RegisterMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegisterMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegisterMax =
    copy(regs = newChildren(0))
}

object RegisterMax {
  /** Column-API binding. */
  def register_max(regs: Column): Column =
    GraftExpressionBridge.column(RegisterMax(
      GraftExpressionBridge.expression(regs)).toAggregateExpression())
}
