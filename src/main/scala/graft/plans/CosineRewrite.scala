package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/**
 * Catalyst optimizer rule: recognize the built-ins-only cosine-similarity
 * formulation
 *
 *   aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0, (s,v) -> s+v)
 *   / (sqrt(aggregate(transform(a, x -> double(x)*double(x)), 0.0, +))
 *      * sqrt(aggregate(transform(b, ...), 0.0, +)))
 *
 * over `array<float>` columns and substitute the native whole-stage-codegen
 * kernel [[graft.functions.CosineSimilarity]]. Higher-order functions are
 * CodegenFallback (interpreted lambda dispatch per row, materialized zipped
 * array); the kernel is one fused loop — 51× measured (BASELINE.md). The
 * substitution is semantics-preserving BY CONSTRUCTION: the kernel computes
 * the identical double left-fold, including NULL on length mismatch / null
 * elements (bit-identity asserted in PipelineSpec with this rule excluded,
 * so the proof never compares the kernel against itself).
 *
 * Matching is deliberately conservative: the exact lambda shapes above, a
 * 0.0 double zero, identity finish, both inputs `array<float>`, and the
 * norm arguments semantically equal to the dot's inputs. Anything else —
 * double arrays (whose casts the optimizer elides), reordered factors,
 * different accumulators — is left untouched.
 *
 * Registered through [[GraftExtensions]] (`SparkSessionExtensions
 * .injectOptimizerRule`), the standard plug-in seam — user code keeps
 * writing the portable formulation and gets the kernel's plan.
 */
object CosineRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def castToDouble(e: Expression): Option[Expression] = e match {
    case c: Cast if c.dataType == DoubleType => Some(c.child)
    case _ => None
  }

  /** (x, y) -> double(x) * double(y), factors in argument order. */
  private def isDotLambda(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (castToDouble(m.left), castToDouble(m.right)) match {
        case (Some(l), Some(r)) => sameVar(l, x) && sameVar(r, y)
        case _ => false
      }
    case _ => false
  }

  /** (x) -> double(x) * double(x). */
  private def isSquareLambda(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable), _) =>
      (castToDouble(m.left), castToDouble(m.right)) match {
        case (Some(l), Some(r)) => sameVar(l, x) && sameVar(r, x)
        case _ => false
      }
    case _ => false
  }

  /** (acc, v) -> acc + v, in argument order. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      sameVar(a.left, acc) && sameVar(a.right, v)
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** Matches sqrt's argument as Σ x² over some array; returns that array. */
  private def sumOfSquares(e: Expression): Option[Expression] = e match {
    case agg: ArrayAggregate
        if isZeroDouble(agg.zero) && isSumMerge(agg.merge) &&
          isIdentityFinish(agg.finish) =>
      agg.argument match {
        case t: ArrayTransform if isSquareLambda(t.function) => Some(t.argument)
        case _ => None
      }
    case _ => None
  }

  private def floatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case div: Divide =>
      val rewritten = for {
        dotAgg <- Some(div.left).collect { case a: ArrayAggregate => a }
        if isZeroDouble(dotAgg.zero) && isSumMerge(dotAgg.merge) &&
          isIdentityFinish(dotAgg.finish)
        z <- Some(dotAgg.argument).collect { case z: ZipWith => z }
        if isDotLambda(z.function) && floatArray(z.left) && floatArray(z.right)
        m <- Some(div.right).collect { case m: Multiply => m }
        sa <- Some(m.left).collect { case s: Sqrt => s }
        sb <- Some(m.right).collect { case s: Sqrt => s }
        na <- sumOfSquares(sa.child)
        nb <- sumOfSquares(sb.child)
        if na.semanticEquals(z.left) && nb.semanticEquals(z.right)
      } yield graft.functions.CosineSimilarity(z.left, z.right)
      rewritten.getOrElse(div)
  }
}

/** Session plug-in (`SparkSession.builder.withExtensions` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => CosineRewrite)
}
