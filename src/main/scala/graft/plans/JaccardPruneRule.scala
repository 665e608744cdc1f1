package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a filter of the shape
  *
  *   size(array_intersect(a,b)) / size(array_union(a,b)) >= t      (t > 0)
  *
  * (set jaccard against a literal threshold — the core predicate of every
  * similarity self-join) implies the far cheaper necessary condition
  *
  *   least(size(a), size(b)) >= t * greatest(size(a), size(b))
  *
  * because |A∩B| ≤ min and |A∪B| ≥ max. This rule conjoins that prune so
  * it is evaluated FIRST (Spark evaluates And left-to-right), letting
  * mismatched-size pairs skip the O(|a|+|b|) intersect/union entirely.
  * Registered through SparkSessionExtensions.injectOptimizerRule — the
  * user writes the textbook jaccard filter; the engine makes it cheap.
  */
object JaccardPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  private object JaccardGeq {
    /** matches jaccard(a,b) >= t / t <= jaccard(a,b), returns (a, b, t) */
    def unapply(e: Expression): Option[(Expression, Expression, Double)] = e match {
      case GreaterThanOrEqual(Jaccard(a, b), DoubleLit(t)) => Some((a, b, t))
      case LessThanOrEqual(DoubleLit(t), Jaccard(a, b))    => Some((a, b, t))
      case _                                               => None
    }
  }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _                              => None
    }
  }

  private object Jaccard {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Divide(
            Cast(Size(ArrayIntersect(a1, b1), _), DoubleType, _, _),
            Cast(Size(u, _), DoubleType, _, _), _) =>
        u match {
          case ArrayUnion(a2, b2) if a1.semanticEquals(a2) && b1.semanticEquals(b2) => Some((a1, b1))
          case _ => None
        }
      case _ => None
    }
  }

  private def prune(a: Expression, b: Expression, t: Double): Expression = {
    val sa = Cast(Size(a, legacySizeOfNull = false), DoubleType)
    val sb = Cast(Size(b, legacySizeOfNull = false), DoubleType)
    GreaterThanOrEqual(Least(Seq(sa, sb)), Multiply(Literal(t), Greatest(Seq(sa, sb))))
  }

  /** cond + any missing prunes, prunes first; None when nothing to add.
    * Idempotent under the optimizer's fixpoint loop: prunes already present
    * (semantically) are not re-added.
    */
  private def withPrunes(cond: Expression): Option[Expression] = {
    val existing = splitConjunctivePredicates(cond)
    val prunes = cond.collect { case JaccardGeq(a, b, t) if t > 0 => prune(a, b, t) }
      .filterNot(p => existing.exists(_.semanticEquals(p)))
    if (prunes.isEmpty) None else Some(And(prunes.reduce(And), cond))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // predicate may still sit in a Filter, or already be pushed into a Join
    case f @ Filter(cond, child) =>
      withPrunes(cond).map(Filter(_, child)).getOrElse(f)
    case j: Join if j.condition.isDefined =>
      withPrunes(j.condition.get).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
