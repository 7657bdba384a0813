package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftExpressionBridge}

/**
 * Insert-only open-addressing hash set of longs — the aggregation buffer of
 * [[SetUnion]]. No boxing, no tombstones (the aggregate only ever adds);
 * 0L is handled by a sentinel flag so the backing array can use it as the
 * empty marker. Power-of-two capacity, grown at 50% load.
 */
final class LongHashSet(initialCapacity: Int = 16) extends Serializable {
  private var keys = new Array[Long](Integer.highestOneBit(
    math.max(16, initialCapacity * 2) - 1) << 1)
  private var mask = keys.length - 1
  private var hasZero = false
  private var nonZero = 0

  def size: Int = nonZero + (if (hasZero) 1 else 0)

  @inline private def slot(k: Long): Int =
    ((k * 0x9E3779B97F4A7C15L) >>> 32).toInt & mask

  def add(k: Long): Unit = {
    if (k == 0L) { hasZero = true; return }
    var i = slot(k)
    while (keys(i) != 0L) {
      if (keys(i) == k) return
      i = (i + 1) & mask
    }
    keys(i) = k
    nonZero += 1
    if (nonZero * 2 > keys.length) grow()
  }

  private def grow(): Unit = {
    val old = keys
    keys = new Array[Long](old.length << 1)
    mask = keys.length - 1
    var j = 0
    while (j < old.length) {
      val k = old(j)
      if (k != 0L) {
        var i = slot(k)
        while (keys(i) != 0L) i = (i + 1) & mask
        keys(i) = k
      }
      j += 1
    }
  }

  /** Visit every element (no allocation, no ordering guarantee). */
  def foreachElem(f: Long => Unit): Unit = {
    if (hasZero) f(0L)
    var j = 0
    while (j < keys.length) {
      if (keys(j) != 0L) f(keys(j))
      j += 1
    }
  }

  /** Distinct elements, ascending (deterministic output rows). */
  def toSortedArray: Array[Long] = {
    val out = new Array[Long](size)
    var o = 0
    if (hasZero) { out(0) = 0L; o = 1 }
    var j = 0
    while (j < keys.length) {
      if (keys(j) != 0L) { out(o) = keys(j); o += 1 }
      j += 1
    }
    java.util.Arrays.sort(out)
    out
  }
}

/**
 * Exact distinct-union over `array<bigint>` columns as an aggregate:
 * `set_union(arr)` folds a group's arrays into one SORTED array of the
 * distinct elements — the exact-set twin of [[RegisterMax]] (which is the
 * same union on HLL sketches), built for [[graft.algo.Neighborhood.exact]]'s
 * ball state.
 *
 * WHY an aggregate and not `collect_list` + `flatten` + `array_distinct`:
 * identical to the RegisterMax argument — a hub vertex unions the balls of
 * ALL its in-neighbors, and collect_list materializes every input array on
 * one reducer before deduping. This TypedImperativeAggregate runs as an
 * ObjectHashAggregate with map-side partial aggregation: each task folds its
 * slice into one hash set per group, duplicates collapse BEFORE the shuffle,
 * and partials merge associatively.
 *
 * NULL input arrays are skipped; an empty group evals to NULL (matching
 * RegisterMax's convention); element nulls are not expected (the operator
 * feeds it non-null id arrays) and would fail loudly in eval.
 */
case class SetUnion(elems: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongHashSet] {

  override def children: Seq[Expression] = Seq(elems)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "set_union"

  override def checkInputDataTypes(): TypeCheckResult = elems.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"set_union expects array<bigint>, got $other")
  }

  override def createAggregationBuffer(): LongHashSet = null

  override def update(buffer: LongHashSet, input: InternalRow): LongHashSet = {
    val v = elems.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val b = if (buffer == null) new LongHashSet(arr.numElements()) else buffer
      var i = 0
      val m = arr.numElements()
      while (i < m) { b.add(arr.getLong(i)); i += 1 }
      b
    }
  }

  override def merge(buffer: LongHashSet, other: LongHashSet): LongHashSet =
    if (other == null) buffer
    else {
      // walk the other buffer's raw slots — merging needs no order, and
      // the sort-then-insert alternative paid O(s log s) per partial merge
      val b = if (buffer == null) new LongHashSet(other.size) else buffer
      other.foreachElem(b.add)
      b
    }

  override def eval(buffer: LongHashSet): Any =
    if (buffer == null) null
    else UnsafeArrayData.fromPrimitiveArray(buffer.toSortedArray)

  override def serialize(buffer: LongHashSet): Array[Byte] = {
    if (buffer == null) Array(0, 0, 0, 0)
    else {
      val arr = buffer.toSortedArray
      val bb = ByteBuffer.allocate(4 + 8 * arr.length)
      bb.putInt(arr.length + 1) // +1 so an empty set is distinct from null
      var i = 0
      while (i < arr.length) { bb.putLong(arr(i)); i += 1 }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): LongHashSet = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    if (n == 0) null
    else {
      val out = new LongHashSet(n - 1)
      var i = 0
      while (i < n - 1) { out.add(bb.getLong()); i += 1 }
      out
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SetUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SetUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SetUnion =
    copy(elems = newChildren(0))
}

object SetUnion {
  /** Column-API binding. */
  def set_union(elems: Column): Column =
    GraftExpressionBridge.column(SetUnion(
      GraftExpressionBridge.expression(elems)).toAggregateExpression())
}
