package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, ArrayTransform, Cast, Expression, LambdaFunction,
  Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule rewriting the reference-shaped higher-order-function
  * dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, x) => acc + x) }}}
  *
  * into the codegen'd [[graft.functions.DotProduct]] expression
  * (`graft_dot`). The HOF form is how the reference's cosine is most
  * naturally transcribed to Spark (cosineSimilarity,
  * reference `src/core/embedding/embedding.ts:143-173`), but it
  * evaluates un-codegen'd with per-element boxing; the native
  * expression is ~5× faster on the kNN hot path (SCALE.md). The rule
  * makes any user-authored HOF spelling get the fast path
  * automatically — the Catalyst-idiomatic way to keep the declarative
  * plan and swap the physical evaluation.
  *
  * The rewrite is exact, not approximate: both forms widen each element
  * to double and accumulate left-to-right in a double (IEEE-identical;
  * multiply/add operand order is commutative bit-wise), and both yield
  * NULL on mismatched array lengths (zip_with pads with null) or null
  * elements — see DotProduct's scaladoc. Fires only on the exact shape:
  * zero must be literal 0.0d, merge a plain add of the two lambda vars,
  * finish the identity.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule` in
  * [[graft.functions.GraftExtensions]], so it runs in the
  * user-provided-rules batch of every session optimization.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Strip a pure element-widening `transform(arr, x -> cast(x as
    * double))` wrapper: DotProduct performs the identical per-element
    * widening internally, so scoring the raw float array is bit-equal
    * and skips materializing the doubled copy. */
  private def stripWiden(e: Expression): Expression = e match {
    case ArrayTransform(child,
        LambdaFunction(c @ Cast(v: NamedLambdaVariable, DoubleType, _, _),
          Seq(v2: NamedLambdaVariable), _))
        if v.exprId == v2.exprId && isFloatOrDoubleArray(child) =>
      child
    case ArrayTransform(child,
        LambdaFunction(v: NamedLambdaVariable, Seq(v2: NamedLambdaVariable), _))
        if v.exprId == v2.exprId && isFloatOrDoubleArray(child) =>
      child
    case other => other
  }

  /** Merge lambda must be `(acc, x) => acc + x` (either operand order —
    * IEEE addition is commutative). */
  private def isPlainSum(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
      (l.exprId == a.exprId && r.exprId == x.exprId) ||
        (l.exprId == x.exprId && r.exprId == a.exprId)
    case _ => false
  }

  /** A lambda-var operand, possibly behind an analyzer-inserted
    * widening cast to double (mixed float/double inputs) — DotProduct
    * widens every element to double before multiplying, so the cast is
    * subsumed exactly. */
  private def asVar(e: Expression): Option[NamedLambdaVariable] = e match {
    case v: NamedLambdaVariable => Some(v)
    case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
    case _ => None
  }

  /** Combine lambda must be `(x, y) => x * y` (either operand order)
    * and the product must be computed IN DOUBLE: a float×float multiply
    * (un-cast float lambda vars) rounds each product to float, which
    * graft_dot's widen-first evaluation does not reproduce — that shape
    * is left alone. (It cannot reach a matching merge lambda anyway:
    * the float zip output forces an analyzer cast inside the sum.) */
  private def isPlainProduct(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(m @ Multiply(le, re, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)
        if m.dataType == DoubleType =>
      (asVar(le), asVar(re)) match {
        case (Some(l), Some(r)) =>
          (l.exprId == x.exprId && r.exprId == y.exprId) ||
            (l.exprId == y.exprId && r.exprId == x.exprId)
        case _ => false
      }
    case _ => false
  }

  private def isIdentity(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(v2: NamedLambdaVariable), _) =>
      v.exprId == v2.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(za, zb, prod: LambdaFunction),
          Literal(0.0d, DoubleType),
          merge: LambdaFunction,
          finish: LambdaFunction)
          if isPlainProduct(prod) && isPlainSum(merge) && isIdentity(finish) &&
            isFloatOrDoubleArray(stripWiden(za)) &&
            isFloatOrDoubleArray(stripWiden(zb)) =>
        DotProduct(stripWiden(za), stripWiden(zb))
    }
}
