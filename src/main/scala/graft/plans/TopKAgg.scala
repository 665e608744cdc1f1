package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: `graft_topk(k, ord_array, payload
  * [, keep_ties])` → the k payload structs with the lexicographically
  * LARGEST `ord_array`, descending.
  *
  * Two ord modes, chosen by the ord array's element type:
  *  - `array<long>` — the original fast path (integral/date/timestamp sort
  *    keys, order-isomorphically encoded into longs).
  *  - `array<binary>` — order-preserving byte keys, one blob per sort key:
  *    byte 0 is a tie-mode header (0 = shorter-is-smaller on common-prefix
  *    equality, 1 = inverted), the rest compares unsigned bytewise. This
  *    carries STRING sort keys exactly (UTF-8 bytes compare like Spark's
  *    UTF8String ordering; inverted mode = bit-flipped bytes + shorter-
  *    wins, an exact order reversal with no truncation or sentinels).
  *
  * `keep_ties=true` switches to rank() semantics: every row tying with the
  * k-th best order key is retained (state = k-heap + a tie list, unbounded
  * only when the data itself ties unboundedly — exactly the rank()<=k
  * output), and the result element type becomes
  * `struct<__rank int, __row payload>` so the consumer reads real ranks
  * (positions can't express ties).
  *
  * Why a custom TypedImperativeAggregate: the two stock formulations of
  * "top-k per key" both move the full dataset through the shuffle —
  * `row_number() OVER (PARTITION BY …)` sorts every group, and
  * `slice(sort_array(collect_list(…)))` keeps unbounded partial buffers.
  * This aggregate's partial state is a k-bounded heap, so the map side
  * combines down to ≤ k rows per key per task BEFORE the exchange — at
  * 100 TB the shuffle carries k·|keys| rows instead of |rows|.
  */
case class TopKAgg(
    kExpr: Expression,
    ordExpr: Expression,
    payloadExpr: Expression,
    keepTiesExpr: Expression = Literal(false),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val keepTies: Boolean = keepTiesExpr.eval().asInstanceOf[Boolean]
  private lazy val binaryOrd: Boolean =
    ordExpr.dataType.asInstanceOf[ArrayType].elementType == BinaryType
  private lazy val payloadType: StructType = payloadExpr.dataType.asInstanceOf[StructType]
  @transient private lazy val payloadProj = UnsafeProjection.create(payloadType)

  override def children: Seq[Expression] = Seq(kExpr, ordExpr, payloadExpr, keepTiesExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (keepTies)
      ArrayType(new StructType()
        .add("__rank", IntegerType, nullable = false)
        .add("__row", payloadType, nullable = false), containsNull = false)
    else ArrayType(payloadType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("k must be a literal int")
    else if (!ordExpr.dataType.isInstanceOf[ArrayType] ||
      !Seq(LongType, BinaryType).contains(ordExpr.dataType.asInstanceOf[ArrayType].elementType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("ord must be array<bigint> or array<binary>")
    else if (!payloadExpr.dataType.isInstanceOf[StructType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("payload must be a struct")
    else if (!keepTiesExpr.foldable || keepTiesExpr.dataType != BooleanType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("keep_ties must be a literal boolean")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def ordOf(input: InternalRow): AnyRef = {
    val ordVal = ordExpr.eval(input)
    if (ordVal == null) null
    else if (binaryOrd)
      ordVal.asInstanceOf[ArrayData].toArray[Array[Byte]](BinaryType)
    else ordVal.asInstanceOf[ArrayData].toLongArray()
  }

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k, keepTies, if (binaryOrd) TopKAgg.cmpBinary else TopKAgg.cmpLong)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val ord = ordOf(input)
    if (ord != null && buf.wouldAccept(ord)) {
      val payload = payloadProj(payloadExpr.eval(input).asInstanceOf[InternalRow]).copy()
      buf.offer(ord, payload)
    }
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.entries.foreach { case (ord, row) => buf.offer(ord, row) }
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val sorted = buf.sortedDesc
    if (!keepTies) new GenericArrayData(sorted.map(_._2).toArray[Any])
    else {
      val out = new Array[Any](sorted.size)
      var i = 0
      var rank = 1
      while (i < sorted.size) {
        if (i > 0 && buf.cmp(sorted(i)._1, sorted(i - 1)._1) != 0) rank = i + 1
        out(i) = InternalRow(rank, sorted(i)._2)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val es = buf.entries
    out.writeInt(es.size)
    es.foreach { case (ord, row) =>
      if (binaryOrd) {
        val arr = ord.asInstanceOf[Array[Array[Byte]]]
        out.writeInt(arr.length)
        arr.foreach { b => out.writeInt(b.length); out.write(b) }
      } else {
        val arr = ord.asInstanceOf[Array[Long]]
        out.writeInt(arr.length)
        arr.foreach(out.writeLong)
      }
      val bytes = row.getBytes
      out.writeInt(row.numFields)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val ord: AnyRef =
        if (binaryOrd)
          Array.fill(in.readInt()) {
            val b = new Array[Byte](in.readInt()); in.readFully(b); b
          }
        else Array.fill(in.readInt())(in.readLong())
      val numFields = in.readInt()
      val rowBytes = new Array[Byte](in.readInt())
      in.readFully(rowBytes)
      val row = new UnsafeRow(numFields)
      row.pointTo(rowBytes, rowBytes.length)
      buf.offer(ord, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg = copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg = copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(kExpr = c(0), ordExpr = c(1), payloadExpr = c(2), keepTiesExpr = c(3))
  override def prettyName: String = "graft_topk"
}

object TopKAgg {

  /** lexicographic compare, shorter array = smaller on prefix-equality */
  private[plans] val cmpLong: (AnyRef, AnyRef) => Int = (xa, ya) => {
    val a = xa.asInstanceOf[Array[Long]]
    val b = ya.asInstanceOf[Array[Long]]
    var i = 0
    val n = math.min(a.length, b.length)
    var r = 0
    while (r == 0 && i < n) {
      r = java.lang.Long.compare(a(i), b(i))
      i += 1
    }
    if (r != 0) r else java.lang.Integer.compare(a.length, b.length)
  }

  /** Per-element: byte 0 = tie-mode header (1 = inverted: SHORTER wins on
    * common-prefix equality — the exact reversal of string order that
    * bit-flipped bytes alone cannot express), remaining bytes compare
    * unsigned.
    */
  private def cmpBlob(a: Array[Byte], b: Array[Byte]): Int = {
    val inverted = a.length > 0 && a(0) == 1
    var i = 1
    val n = math.min(a.length, b.length)
    var r = 0
    while (r == 0 && i < n) {
      r = java.lang.Integer.compare(a(i) & 0xFF, b(i) & 0xFF)
      i += 1
    }
    if (r != 0) r
    else if (inverted) java.lang.Integer.compare(b.length, a.length)
    else java.lang.Integer.compare(a.length, b.length)
  }

  private[plans] val cmpBinary: (AnyRef, AnyRef) => Int = (xa, ya) => {
    val a = xa.asInstanceOf[Array[Array[Byte]]]
    val b = ya.asInstanceOf[Array[Array[Byte]]]
    var i = 0
    val n = math.min(a.length, b.length)
    var r = 0
    while (r == 0 && i < n) {
      r = cmpBlob(a(i), b(i))
      i += 1
    }
    if (r != 0) r else java.lang.Integer.compare(a.length, b.length)
  }

  /** k-bounded min-heap on ord (the heap root is the WORST retained entry,
    * evicted when something better arrives). With `keepTies`, rows tying
    * with the root of a FULL heap are retained in a side list (rank()
    * semantics — every rank ≤ k row survives).
    */
  final class Buffer(k: Int, keepTies: Boolean, val cmp: (AnyRef, AnyRef) => Int) {
    private val heap = new java.util.PriorityQueue[(AnyRef, UnsafeRow)](
      math.max(k, 1), (x: (AnyRef, UnsafeRow), y: (AnyRef, UnsafeRow)) => cmp(x._1, y._1))
    private val ties = scala.collection.mutable.ArrayBuffer.empty[(AnyRef, UnsafeRow)]

    def wouldAccept(ord: AnyRef): Boolean = {
      if (heap.size < k) true
      else {
        val c = cmp(ord, heap.peek()._1)
        c > 0 || (keepTies && c == 0)
      }
    }

    def offer(ord: AnyRef, row: UnsafeRow): Unit =
      if (heap.size < k) heap.add((ord, row))
      else {
        val c = cmp(ord, heap.peek()._1)
        if (c > 0) {
          val old = heap.poll()
          heap.add((ord, row))
          if (keepTies) {
            // ties hold rows == the old root; a strictly larger new root
            // invalidates them all, an equal one keeps them + the evictee
            if (cmp(old._1, heap.peek()._1) == 0) ties += old
            else ties.clear()
          }
        } else if (keepTies && c == 0) ties += ((ord, row))
      }

    def entries: Seq[(AnyRef, UnsafeRow)] = {
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala.toSeq ++ ties.toSeq
    }

    def sortedDesc: Seq[(AnyRef, UnsafeRow)] =
      entries.sortWith((x, y) => cmp(x._1, y._1) > 0)
  }
}
