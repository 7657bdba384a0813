package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}
import org.apache.spark.sql.{Column, GraftExpressionBridge}

/**
 * Nearest-centroid assignment: `argmax_cell cosine(vec, centroid(cell))`
 * over a driver-resident centroid matrix, as ONE compact expression.
 *
 * WHY this exists when `array_max(array(struct(cosine(vec, lit_c1), …)))`
 * already expressed the same argmax: that formulation inlines one cosine
 * kernel PER CENTROID into the generated code, so the Janino class grows
 * linearly in nlist and whole-stage-codegen COMPILATION dominates training
 * (measured: nlist 32 trains in 52.6 s with codegen on vs 14.7 s with it
 * off — ~38 s of pure compile time, recompiled every Lloyd iteration
 * because the centroid literals change). At a production nlist (thousands
 * of cells for a 10^12-row corpus) the inlined form would not compile at
 * all. This expression generates a constant-size call into a static JVM
 * kernel — the centroids travel via the codegen references array — so the
 * source is tiny at any nlist and whole-stage codegen stays intact.
 *
 * Semantics match the formulation it replaces (A/B-asserted in
 * ScalePlanSpec over hostile rows too):
 *  - per-centroid similarity is the lenient cosine kernel's double
 *    left-fold ([[CosineSimilarity]]); a length mismatch, null element, or
 *    zero norm yields no similarity for that centroid;
 *  - winner = highest similarity, ties to the LOWEST cell id (the struct
 *    ordering on (sim, -cell));
 *  - a row with NO defined similarity (null/zero/ragged vector) falls to
 *    the lowest cell id, exactly as the null-sim struct comparison did —
 *    assignment is total, one degenerate row never aborts an index build.
 *
 * ONE deliberate divergence: a vector containing a NaN ELEMENT. Its cosine
 * against every same-length centroid is NaN; Spark's struct ordering ranks
 * NaN above any finite double, so the portable `array_max` formulation
 * would crown a NaN-similarity cell (and WHICH cell then depends on tie
 * order among all-NaN sims). The kernel instead SKIPS NaN similarities —
 * order-independent by construction — so such a row has no defined
 * similarity at all and falls to the lowest cell id like every other
 * degenerate row. ScalePlanSpec pins both behaviors explicitly.
 */
case class NearestCell(child: Expression, cells: Array[Int],
    matrix: Array[Array[Float]]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects array<float>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false // total: degenerate rows fall to the lowest cell
  override def prettyName: String = "nearest_cell"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    NearestCell.nearest(
      if (v == null) null else v.asInstanceOf[ArrayData], cells, matrix)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val matRef = ctx.addReferenceObj("matrix", matrix, "float[][]")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = graft.functions.NearestCell.nearest(
          ${c.isNull} ? null : ${c.value}, $cellsRef, $matRef);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {

  /** The kernel (shared by interpreted eval and generated code). One pass
    * over the centroids per row; the cosine fold is the same double
    * left-fold as [[CosineSimilarity]] so similarities are bit-identical
    * to the formulation this replaces. */
  def nearest(vec: ArrayData, cells: Array[Int],
      matrix: Array[Array[Float]]): Int = {
    var minCell = Int.MaxValue
    var k = 0
    while (k < cells.length) {
      if (cells(k) < minCell) minCell = cells(k)
      k += 1
    }
    if (vec == null) return minCell
    val n = vec.numElements()
    var bestCell = -1
    var bestSim = 0.0
    k = 0
    while (k < cells.length) {
      val cv = matrix(k)
      if (cv.length == n) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var ok = true
        var i = 0
        while (ok && i < n) {
          if (vec.isNullAt(i)) ok = false
          else {
            val xi = vec.getFloat(i).toDouble
            val yi = cv(i).toDouble
            dot += xi * yi; na += xi * xi; nb += yi * yi
            i += 1
          }
        }
        // a NaN element makes dot/na/nb all NaN (na != 0.0 is TRUE for NaN,
        // so the zero-norm check doesn't catch it) — skip the NaN sim
        // explicitly so the winner never depends on centroid order: without
        // this, a NaN sim arriving FIRST would stick (nothing beats NaN
        // under `>`) while one arriving later would be skipped
        if (ok && na != 0.0 && nb != 0.0) {
          val sim = dot / (math.sqrt(na) * math.sqrt(nb))
          if (!java.lang.Double.isNaN(sim) && (bestCell == -1 || sim > bestSim ||
              (sim == bestSim && cells(k) < bestCell))) {
            bestSim = sim
            bestCell = cells(k)
          }
        }
      }
      k += 1
    }
    if (bestCell == -1) minCell else bestCell
  }

  /** Column binding over a trained quantizer. */
  def nearest_cell(vec: Column, cs: Seq[(Int, Array[Float])]): Column = {
    require(cs.nonEmpty, "nearest_cell needs at least one centroid")
    GraftExpressionBridge.column(NearestCell(
      GraftExpressionBridge.expression(vec),
      cs.map(_._1).toArray, cs.map(_._2).toArray))
  }
}
