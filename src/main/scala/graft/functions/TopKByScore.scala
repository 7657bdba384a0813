package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftExpressionBridge}

/** Bounded top-k heap: keeps the k best (score, id) pairs under the ranking
  * order score DESC then id ASC. The internal priority queue dequeues the
  * WORST kept pair, so insert/evict is O(log k) and the buffer never exceeds
  * k entries. (score, id) is a total order per group (ids are unique), so
  * the kept set is deterministic regardless of input order. */
final class TopKBuffer(val k: Int) {
  // -0.0 == 0.0 here, matching SQL sort semantics and the primitive ==/>
  // in insert — Ordering[Double] (Double.compare) would call -0.0 < 0.0
  // and rank ties differently than the row_number window this replaces
  @inline private def norm(s: Double): Double = if (s == 0.0) 0.0 else s

  /** Total order with the WORST pair largest (lowest score, then highest
    * id) — the eviction candidate at the heap head. */
  private val worstFirst = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(norm(y._1), norm(x._1))
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }
  private[functions] val heap =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wi) = heap.head
      if (score > ws || (score == ws && id < wi)) {
        heap.dequeue()
        heap.enqueue((score, id))
      }
    }
  }

  /** Kept pairs, best-first (score desc, id asc; -0.0 ties with 0.0).
    * Ascending under `worstFirst` IS best-first: the worst pair compares
    * largest there. */
  def sortedBest: Seq[(Double, Long)] =
    heap.toSeq.sorted(worstFirst)
}

/**
 * Bounded-heap top-k aggregate: `topk_by(score, id, k)` returns the k best
 * (score, id) pairs per group as `array<struct<score double, neighbor
 * bigint>>`, ordered score DESC then id ASC.
 *
 * WHY an aggregate and not a window: ranking ANN candidates with
 * `row_number() over (partition by q order by cos desc)` routes EVERY
 * candidate of a query to one reducer and sorts them all to keep k. This
 * TypedImperativeAggregate instead runs as an ObjectHashAggregate with
 * map-side partial aggregation — each task keeps at most k pairs per query
 * (O(log k) insert), partials merge associatively, and the shuffle carries
 * k rows per (task, query) instead of the full candidate set. At a
 * million-query batch that is the difference between a skew-prone
 * sort-shuffle and a bounded combine.
 *
 * NULL scores are SKIPPED (standard aggregate-function null handling), not
 * ranked last the way a nulls-last window would: with the lenient cosine
 * kernel a NULL score marks a degenerate (zero-norm/length-mismatched)
 * vector, which is excluded from rankings by design.
 */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk_by needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType
  override def prettyName: String = "topk_by"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_by expects (double, bigint), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => buffer.insert(s, i) }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBest.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val entries = buffer.heap.toSeq
    val bb = ByteBuffer.allocate(8 + entries.size * 16)
    bb.putInt(buffer.k)
    bb.putInt(entries.size)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    (0 until n).foreach(_ => buf.insert(bb.getDouble(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("neighbor", LongType, nullable = false))), containsNull = false)

  /** Column-API binding. */
  def topk_by(score: Column, id: Column, k: Int): Column =
    GraftExpressionBridge.column(TopKByScore(
      GraftExpressionBridge.expression(score),
      GraftExpressionBridge.expression(id), k).toAggregateExpression())

  /** SQL registration: `SELECT q, topk_by(score, id, 5) FROM ... GROUP BY q`
    * (k must be an integer literal — it sizes the aggregation buffer). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by", exprs => {
        require(exprs.length == 3, "topk_by(score, id, k) takes 3 arguments")
        val k = exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_by: k must be an INT literal, got $other")
        }
        TopKByScore(exprs(0), exprs(1), k)
      }, "scala_udf")
}
