package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, GraftExpressionBridge, SparkSession}

/**
 * Native codegen'd cosine similarity over two `array<float>` columns.
 *
 * WHY a custom Expression (the one place SURVEY.md §7.3's "built-ins only"
 * verdict is overridden, per its own revisit clause): the built-in
 * formulation `aggregate(zip_with(a,b,*),0,+)/…` goes through Catalyst's
 * higher-order functions, which are CodegenFallback — every row pays
 * interpreted lambda dispatch plus a materialized zipped array. This
 * expression is a single fused whole-stage-codegen loop, and it is the hot
 * inner kernel of brute-force ANN scoring (|corpus| × |queries| evals).
 *
 * Math is the EXACT left-fold in double that the portable formulation uses
 * (`Similarity.cosinePortable`), so results are bit-identical — asserted in
 * PipelineSpec — and the DuckDB oracles are unaffected. That includes the
 * null semantics: unequal-length arrays (zip_with null-pads the shorter
 * side ⇒ null dot) and null elements (null propagates through * and +)
 * both yield NULL here too, not a prefix-truncated number.
 *
 * Zero-norm divisor (a zero vector or an empty array) follows `Divide`
 * exactly, NOT IEEE NaN: under ANSI (Spark 4's default) it raises
 * DIVIDE_BY_ZERO, otherwise it is NULL — `failOnError` is captured from
 * SQLConf at construction time, the same pattern as `Divide.failOnError`.
 * Without this the [[graft.plans.CosineRewrite]] substitution would
 * silently turn the portable form's error/NULL into NaN.
 */
case class CosineSimilarity(left: Expression, right: Expression,
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even for non-null children: length-mismatch / null element ⇒ null
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) {
      if (failOnError) throw CosineSimilarity.divByZero() else null
    } else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double $xi = (double) $a.getFloat($i);
         |      double $yi = (double) $b.getFloat($i);
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) {
         |      ${if (failOnError)
                  s"throw graft.functions.CosineSimilarity.divByZero();"
                else s"${ev.isNull} = true;"}
         |    } else {
         |      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** The exact error `Divide` raises on a zero divisor under ANSI (called
    * from both the interpreted and the generated code path). */
  def divByZero(): ArithmeticException = GraftExpressionBridge.divideByZeroError()

  /** Column-API binding (Divide-parity zero-norm: throws under ANSI). */
  def cosine_similarity(a: Column, b: Column): Column =
    GraftExpressionBridge.column(CosineSimilarity(
      GraftExpressionBridge.expression(a),
      GraftExpressionBridge.expression(b)))

  /** Lenient binding: zero-norm ⇒ NULL regardless of ANSI mode — for
    * internal bucketing/assignment/ranking kernels where one degenerate
    * vector must not abort the job (see `Similarity.cosine`). */
  def cosine_similarity_lenient(a: Column, b: Column): Column =
    GraftExpressionBridge.column(CosineSimilarity(
      GraftExpressionBridge.expression(a),
      GraftExpressionBridge.expression(b), failOnError = false))

  /** SQL registration: `SELECT cosine_similarity(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
}
