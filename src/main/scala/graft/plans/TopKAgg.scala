package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: `graft_topk(k, ord_array, payload)` →
  * the k payload structs with the lexicographically LARGEST `ord_array`
  * (array<long>), descending.
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
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val payloadType: StructType = payloadExpr.dataType.asInstanceOf[StructType]
  @transient private lazy val payloadProj = UnsafeProjection.create(payloadType)

  override def children: Seq[Expression] = Seq(kExpr, ordExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payloadType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("k must be a literal int")
    else if (!ordExpr.dataType.isInstanceOf[ArrayType] ||
      ordExpr.dataType.asInstanceOf[ArrayType].elementType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("ord must be array<bigint>")
    else if (!payloadExpr.dataType.isInstanceOf[StructType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("payload must be a struct")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val ordVal = ordExpr.eval(input)
    if (ordVal != null) {
      val ord = ordVal.asInstanceOf[ArrayData].toLongArray()
      if (buf.wouldAccept(ord)) {
        val payload = payloadProj(payloadExpr.eval(input).asInstanceOf[InternalRow]).copy()
        buf.offer(ord, payload)
      }
    }
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.entries.foreach { case (ord, row) => buf.offer(ord, row) }
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any =
    new GenericArrayData(buf.sortedDesc.map(_._2).toArray[Any])

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val es = buf.entries
    out.writeInt(es.size)
    es.foreach { case (ord, row) =>
      out.writeInt(ord.length)
      ord.foreach(out.writeLong)
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
    val buf = new TopKAgg.Buffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val ord = Array.fill(in.readInt())(in.readLong())
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
    copy(kExpr = c(0), ordExpr = c(1), payloadExpr = c(2))
  override def prettyName: String = "graft_topk"
}

object TopKAgg {

  /** lexicographic compare, shorter array = smaller on prefix-equality */
  private def cmp(a: Array[Long], b: Array[Long]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      if (a(i) != b(i)) return java.lang.Long.compare(a(i), b(i))
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  /** k-bounded min-heap on ord (the heap root is the WORST retained entry,
    * evicted when something better arrives).
    */
  final class Buffer(k: Int) {
    private val heap = new java.util.PriorityQueue[(Array[Long], UnsafeRow)](
      math.max(k, 1), (x: (Array[Long], UnsafeRow), y: (Array[Long], UnsafeRow)) => cmp(x._1, y._1))

    def wouldAccept(ord: Array[Long]): Boolean =
      heap.size < k || cmp(ord, heap.peek()._1) > 0

    def offer(ord: Array[Long], row: UnsafeRow): Unit =
      if (heap.size < k) heap.add((ord, row))
      else if (cmp(ord, heap.peek()._1) > 0) { heap.poll(); heap.add((ord, row)) }

    def entries: Seq[(Array[Long], UnsafeRow)] = {
      import scala.jdk.CollectionConverters._
      heap.iterator().asScala.toSeq
    }

    def sortedDesc: Seq[(Array[Long], UnsafeRow)] =
      entries.sortWith((x, y) => cmp(x._1, y._1) > 0)
  }
}
