package graft.plans

import graft.functions.VectorDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[graft.functions.VectorDotProduct]] — same
  * accumulation order, same result, ~30 ns instead of ~1 µs/element.
  * Users keep writing the declarative built-in form; plans get the
  * kernel automatically.
  *
  * The only custom Rule in the engine, and deliberately an OPTIMIZER
  * rule: it changes cost, never semantics (SURVEY.md §4's "no custom
  * Catalyst needed" verdict stands for correctness). Semantics-preserving
  * in the edge cases too: the kernel mirrors the fold's NULL behavior
  * (length mismatch / null element → NULL), and the rewrite requires the
  * pair product to be a DOUBLE multiply — a raw float×float lambda (whose
  * products round to float before the double sum) is left interpreted.
  *
  * Activate per session via `spark.experimental.extraOptimizations` or
  * at build time with `.withExtensions(new GraftExtensions)`.
  */
object RewriteVectorDot extends Rule[LogicalPlan] {

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case other => other
  }

  /** x * y over exactly the two zip_with lambda variables (any casts),
    * multiplying in DOUBLE — the kernel accumulates double products, so a
    * float-typed multiply (which rounds each product to float first)
    * must not match. */
  private def isPairProduct(mul: Expression, vars: Seq[NamedLambdaVariable]): Boolean =
    mul match {
      case Multiply(l, r, _) if mul.dataType == DoubleType =>
        val ops = Set(strip(l), strip(r))
        vars.size == 2 && ops == vars.toSet.asInstanceOf[Set[Expression]]
      case _ => false
    }

  /** acc + v over exactly the two aggregate lambda variables. */
  private def isSum(add: Expression, vars: Seq[NamedLambdaVariable]): Boolean =
    add match {
      case Add(l, r, _) =>
        val ops = Set(strip(l), strip(r))
        vars.size == 2 && ops == vars.toSet.asInstanceOf[Set[Expression]]
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul, mVars, _)),
            Literal(zero, DoubleType),
            LambdaFunction(add, aVars, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(finArg), _))
          if zero == 0.0 && isVec(a) && isVec(b) &&
            isPairProduct(mul, mVars.collect { case v: NamedLambdaVariable => v }) &&
            isSum(add, aVars.collect { case v: NamedLambdaVariable => v }) &&
            fin.exprId == finArg.asInstanceOf[NamedLambdaVariable].exprId =>
        VectorDotProduct(a, b)
    }
}

/** Session-extension hook: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or spark.sql.extensions=graft.plans.GraftExtensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RewriteVectorDot)
}
