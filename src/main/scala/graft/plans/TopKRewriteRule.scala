package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Auto-rewrite of the "top-k per key" window idiom into the bounded
  * [[TopKAgg]] aggregate:
  *
  * {{{
  *   Filter(rn <= k)                      Project(cols..., rn = pos+1 | __rank)
  *     Window(rn = row_number() | rank()    Generate(posexplode(topk))
  *            over p order o)          =>     Aggregate(p, graft_topk(k, enc(o), struct(cols), ties))
  * }}}
  *
  * Why: the window formulation shuffles and sorts EVERY row of every group;
  * the aggregate's partial state is a k-bounded heap, so each map task
  * pre-combines to ≤ k rows per key before the exchange (measured 4.7× on
  * the latest-order-per-customer shape at sf0.1; at 100 TB the shuffle
  * carries k·|keys| rows instead of |rows|).
  *
  * Safety: fires when every ORDER BY key is integral-like (int/long/date/
  * timestamp/boolean — encoded order-isomorphically into the agg's
  * array<long> sort key) or STRING (any string key switches the whole sort
  * key to the array<binary> mode: order-preserving byte blobs, exact — see
  * [[TopKAgg]]), the partition keys are plain attributes, k ≤
  * spark.graft.topk.rewrite.maxK, and the bound is a literal. Every
  * nullable sort key contributes a separate null-flag element encoding the
  * window's null placement — nulls never share an encoding with extreme
  * real values. `row_number()` keeps arbitrary ties like the window does;
  * `rank()` rewrites with keep_ties=true (every rank ≤ k row retained, the
  * rank restored from the aggregate's own tie-aware numbering). Disable
  * with spark.graft.topk.rewrite=false.
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
          w @ Window(Seq(Alias(WindowExpression(rankFn, spec), _)), partSpec, orderSpec, child, _)))
          if rankLike(rankFn).isDefined && spec.partitionSpec == partSpec && spec.orderSpec == orderSpec =>
        rewrite(f, w, cond, partSpec, orderSpec, child, needed = Some(p.references),
            tieRank = rankLike(rankFn).get)
          .map(r => p.copy(child = r)).getOrElse(p)
      case f @ Filter(cond,
          w @ Window(Seq(Alias(WindowExpression(rankFn, spec), _)), partSpec, orderSpec, child, _))
          if rankLike(rankFn).isDefined && spec.partitionSpec == partSpec && spec.orderSpec == orderSpec =>
        rewrite(f, w, cond, partSpec, orderSpec, child, needed = None,
          tieRank = rankLike(rankFn).get).getOrElse(f)
    }

  /** Some(false) = row_number (arbitrary ties), Some(true) = rank (keep
    * ties); None = not rewritable. dense_rank is NOT rewritable to a
    * k-bounded heap (k distinct key VALUES can cover unbounded rows whose
    * per-row ranks the heap can't see).
    */
  private def rankLike(e: Expression): Option[Boolean] = e match {
    case _: RowNumber => Some(false)
    case _: Rank      => Some(true)
    case _            => None
  }

  private def rewrite(f: Filter, w: Window, cond: Expression, partSpec: Seq[Expression],
                      orderSpec: Seq[SortOrder], child: LogicalPlan,
                      needed: Option[AttributeSet], tieRank: Boolean): Option[LogicalPlan] = {
    val rnAttr = w.windowOutputSet.head
    val partAttrs = partSpec.collect { case a: AttributeReference => a }
    if (partAttrs.size != partSpec.size) return None
    if (orderSpec.isEmpty) return None
    if (orderSpec.exists(so => !so.child.deterministic)) return None
    // any string key switches ALL keys to the binary encoding (one array,
    // one element type); otherwise the cheaper long encoding carries them
    val useBinary =
      if (orderSpec.forall(so => longEncodable(so.child.dataType))) false
      else if (orderSpec.forall(so =>
        longEncodable(so.child.dataType) || so.child.dataType == StringType)) true
      else return None

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
        val ordArray = CreateArray(orderSpec.flatMap(so =>
          if (useBinary) encodeBinary(so) else encodeLong(so)))
        val aggFn = TopKAgg(Literal(kv), ordArray, payload, Literal(tieRank))
        val topkAlias = Alias(
          AggregateExpression(aggFn, aggregate.Complete, isDistinct = false), "__graft_topk")()
        val agg = Aggregate(partAttrs, (partAttrs: Seq[NamedExpression]) :+ topkAlias, child, None)

        val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
        val elemType = aggFn.dataType.asInstanceOf[ArrayType].elementType
        val elemAttr = AttributeReference("__graft_row", elemType, nullable = false)()
        val gen = Generate(PosExplode(topkAlias.toAttribute),
          unrequiredChildIndex = Seq(partAttrs.size), outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, elemAttr), agg)

        // rank mode wraps the payload: struct<__rank int, __row payload>
        val rowExpr: Expression =
          if (tieRank) GetStructField(elemAttr, 1, Some("__row")) else elemAttr
        val fieldIdx = payloadAttrs.map(_.exprId).zipWithIndex.toMap
        val restored: Seq[NamedExpression] = child.output.collect {
          case a if partAttrs.exists(_.exprId == a.exprId) => a
          case a if fieldIdx.contains(a.exprId) =>
            Alias(GetStructField(rowExpr, fieldIdx(a.exprId), Some(a.name)), a.name)(exprId = a.exprId)
        }
        val rnRestored =
          if (tieRank)
            Alias(GetStructField(elemAttr, 0, Some("__rank")), rnAttr.name)(exprId = rnAttr.exprId)
          else Alias(Add(posAttr, Literal(1)), rnAttr.name)(exprId = rnAttr.exprId)
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

  private def integralEncodable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** Long-encodable = integral-like plus float/double via the IEEE-bits
    * order isomorphism ([[DoubleOrdinalLong]]) — what score-ranked top-k
    * shapes (tf-idf, quality gates, ANN ranks) order by.
    */
  private def longEncodable(dt: DataType): Boolean =
    integralEncodable(dt) || dt == DoubleType || dt == FloatType

  /** The null-placement flag element preceding every nullable key: larger =
    * kept first, so the null rows get the larger flag exactly when the
    * window sorts them first. A SEPARATE element (not a sentinel value in
    * the key's own range) — Long.MaxValue/MinValue are real encodings of
    * extreme values and must stay distinguishable from null.
    */
  private def nullFlag(so: SortOrder, mk: Long => Literal): Seq[Expression] =
    if (!so.child.nullable) Nil
    else {
      val (nullV, nonNullV) = so.nullOrdering match {
        case NullsFirst => (mk(1L), mk(0L)) // first ⇒ best ⇒ larger
        case NullsLast  => (mk(0L), mk(1L))
      }
      Seq(If(IsNull(so.child), nullV, nonNullV))
    }

  /** Order-isomorphic long encoding: "earlier in the window's sort order" ⇒
    * "larger encoded value" (TopKAgg keeps the largest). Bitwise NOT
    * reverses long order without overflow; null rows read a constant 0 in
    * the value slot — their placement is already decided by the flag
    * element.
    */
  private def encodeLong(so: SortOrder): Seq[Expression] = {
    val asLong: Expression = so.child.dataType match {
      case LongType    => so.child
      case BooleanType => Cast(so.child, LongType)
      case DoubleType  => DoubleOrdinalLong(so.child)
      case FloatType   => DoubleOrdinalLong(Cast(so.child, DoubleType))
      case _           => OrdinalLong(so.child)
    }
    val nonNull = so.direction match {
      case Ascending  => BitwiseNot(asLong)
      case Descending => asLong
    }
    val value = if (so.child.nullable) If(IsNull(so.child), Literal(0L), nonNull) else nonNull
    nullFlag(so, v => Literal(v)) :+ value
  }

  /** Order-preserving byte encoding (strings exact — see [[OrderedBytes]]);
    * integral keys ride along as 8-byte blobs of the same long encoding.
    */
  private def encodeBinary(so: SortOrder): Seq[Expression] = {
    val invert = so.direction == Ascending // kept-first = largest encoding
    val nonNull: Expression = so.child.dataType match {
      case StringType => OrderedBytes(so.child, invert)
      case LongType   => OrderedBytes(so.child, invert)
      case BooleanType => OrderedBytes(Cast(so.child, LongType), invert)
      case DoubleType => OrderedBytes(DoubleOrdinalLong(so.child), invert)
      case FloatType  => OrderedBytes(DoubleOrdinalLong(Cast(so.child, DoubleType)), invert)
      case _          => OrderedBytes(OrdinalLong(so.child), invert)
    }
    val value =
      if (so.child.nullable)
        If(IsNull(so.child), Literal(Array[Byte](0), BinaryType), nonNull)
      else nonNull
    nullFlag(so, v => Literal(Array[Byte](0, v.toByte), BinaryType)) :+ value
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

/** Order-isomorphic long encoding of a double under Spark's nan-safe
  * ordering: IEEE-754 bits with the sign region remapped — non-negative
  * bit patterns keep their value, negative patterns flip entirely — so
  * signed-long comparison of encodings equals Spark's double comparison.
  * −0.0 normalizes to 0.0 first (Spark's nan-safe compare treats them as
  * EQUAL — the encoding must tie them, not order them), and
  * doubleToLongBits canonicalizes every NaN to one pattern that encodes
  * above +Infinity — exactly the "all NaN equal, NaN largest" contract.
  */
private[plans] case class DoubleOrdinalLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    DoubleOrdinalLong.encode(input.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.plans.DoubleOrdinalLong.encode((double)($c))")
  override protected def withNewChildInternal(newChild: Expression): DoubleOrdinalLong =
    copy(child = newChild)
}

object DoubleOrdinalLong {
  def encode(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(if (d == 0.0d) 0.0d else d)
    if (b >= 0L) b else ~b ^ Long.MinValue
  }
}

/** Order-preserving binary sort-key blob for [[TopKAgg]]'s array<binary>
  * mode. Byte 0 is the tie-mode header [[TopKAgg]] compares by; the rest:
  *
  *  - strings: UTF-8 bytes (unsigned bytewise compare == Spark's
  *    UTF8String order). `invert` flips every byte AND sets the header so
  *    common-prefix ties resolve shorter-first — an EXACT order reversal
  *    (bit-flipping alone gets prefix pairs backwards; truncated-prefix
  *    schemes are not exact at all).
  *  - longs: 8 bytes big-endian with the sign bit flipped (unsigned byte
  *    order == signed long order); fixed width, so the header never
  *    matters.
  */
private[plans] case class OrderedBytes(child: Expression, invert: Boolean)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      val bytes = input.asInstanceOf[UTF8String].getBytes
      val out = new Array[Byte](bytes.length + 1)
      out(0) = if (invert) 1 else 0
      var i = 0
      while (i < bytes.length) {
        out(i + 1) = if (invert) (~bytes(i)).toByte else bytes(i)
        i += 1
      }
      out
    case _ =>
      val raw = input.asInstanceOf[Long] ^ Long.MinValue
      val v = if (invert) ~raw else raw
      Array[Byte](0,
        (v >>> 56).toByte, (v >>> 48).toByte, (v >>> 40).toByte, (v >>> 32).toByte,
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedBytes =
    copy(child = newChild)
}
