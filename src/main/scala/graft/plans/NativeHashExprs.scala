package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-heavy dedup fingerprints.
  *
  * The pure-`functions._` formulations (TextFunctions.simhash64 /
  * minhashSignature) are correct but run as interpreted higher-order
  * lambdas — 64 nested folds per document. These single-pass eval
  * implementations are ~50× faster on the same semantics; at 100 TB the
  * fingerprint map stage is the whole cost of dedup candidate generation,
  * so this is the hot path that justifies dropping below the DataFrame API
  * (SURVEY.md §2 preference order: compose → custom Expression → custom
  * plan → mapPartitions).
  */
object NativeHash {

  private[plans] def tokenize(s: UTF8String): Array[String] = {
    // UTF8String.toLowerCase = Spark lower(): locale-immune ASCII fast path,
    // so the native tokenizer matches the declarative lower() on tr/az JVMs
    val t = s.toLowerCase.toString.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  private val md5s = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  // token vocabularies are far smaller than token streams — memoize the
  // pure token→hash function per thread, bounded so adversarial vocab
  // can't grow the heap (clear-on-full keeps amortized O(1))
  private val md5Memo = ThreadLocal.withInitial[java.util.HashMap[String, java.lang.Long]](
    () => new java.util.HashMap[String, java.lang.Long](1 << 14))
  private val Md5MemoMax = 1 << 16

  /** `md5_number_lower(s)` — little-endian uint64 of digest bytes 8..15,
    * the cross-engine hash family shared with DuckDB and Sampling.md5Bucket.
    */
  private[plans] def md5Lower64(s: String): Long = {
    val memo = md5Memo.get()
    val hit = memo.get(s)
    if (hit != null) return hit.longValue()
    val md = md5s.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    if (memo.size >= Md5MemoMax) memo.clear()
    memo.put(s, v)
    v
  }

  /** 64-bit SimHash over whitespace tokens: bit b is the majority vote of
    * bit b across token hashes (ties → 0), matching
    * TextFunctions.simhash64's shape in one pass. The token hash is
    * `md5_number_lower` (not xxhash64) so fingerprints — and therefore the
    * whole near-dup pair set — are reproducible by the DuckDB oracle.
    */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      val counts = new Array[Int](64)
      var i = 0
      while (i < toks.length) {
        val h = md5Lower64(toks(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
  }

  /** k-minhash signature over the distinct word set in one pass:
    * element i = min over words of `xxhash64(i, word)` — the EXACT hash
    * family of the declarative twin (TextFunctions.minhashSignature), so
    * the two are interchangeable: Spark's XxHash64 chains seed 42 →
    * hashInt(i) → hashUnsafeBytes(word), reproduced here with the i-seeds
    * precomputed once per signature.
    */
  case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val words = new java.util.HashSet[String]()
      tokenize(input.asInstanceOf[UTF8String]).foreach(words.add)
      val seeds = new Array[Long](k)
      var s = 0
      while (s < k) { seeds(s) = XXH64.hashInt(s, 42L); s += 1 }
      val mins = Array.fill(k)(Long.MaxValue)
      val it = words.iterator()
      while (it.hasNext) {
        val u = UTF8String.fromString(it.next())
        var i = 0
        while (i < k) {
          val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seeds(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSignature = copy(child = newChild)
  }

  /** Morris XML document → array<struct<gtin,qty,price>> in ONE streaming
    * parse (the xpath-based formulation re-parses the document once per
    * extracted field). StAX pull parser; PHP SimpleXML cast semantics for
    * missing/malformed values (MorrisXmlSftpInputHandler.php:31-37).
    */
  case class MorrisParse(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("gtin", StringType, nullable = false),
        StructField("qty", LongType, nullable = false),
        StructField("price", DoubleType, nullable = false))),
      containsNull = false)

    private def toLongPhp(s: String): Long =
      try s.trim.toLong catch { case _: Exception => try s.trim.toDouble.toLong catch { case _: Exception => 0L } }
    private def toDoublePhp(s: String): Double =
      try s.trim.toDouble catch { case _: Exception => 0.0 }

    override protected def nullSafeEval(input: Any): Any = {
      import javax.xml.stream.XMLStreamConstants
      val reader = MorrisParse.factories.get().createXMLStreamReader(
        new java.io.StringReader(input.asInstanceOf[UTF8String].toString))
      val rows = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow]()
      var gtin = ""; var qty = ""; var price = ""
      var inAvailable = false
      var path = List.empty[String]
      try {
        while (reader.hasNext) {
          reader.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              val name = reader.getLocalName
              path = name :: path
              if (name == "available" && path.length == 2) {
                inAvailable = true; gtin = ""; qty = ""; price = ""
              }
            case XMLStreamConstants.CHARACTERS if inAvailable =>
              path match {
                case "gtin" :: "available" :: _                 => gtin += reader.getText
                case "qty" :: "available" :: _                  => qty += reader.getText
                case "price" :: "detail" :: "available" :: _    => price += reader.getText
                case _                                          =>
              }
            case XMLStreamConstants.END_ELEMENT =>
              if (reader.getLocalName == "available" && path.length == 2) {
                inAvailable = false
                rows += org.apache.spark.sql.catalyst.InternalRow(
                  UTF8String.fromString(gtin), toLongPhp(qty), toDoublePhp(price))
              }
              path = path.tail
            case _ =>
          }
        }
      } finally reader.close()
      new GenericArrayData(rows.toArray[Any])
    }
    override protected def withNewChildInternal(newChild: Expression): MorrisParse = copy(child = newChild)
  }

  object MorrisParse {
    /** XMLInputFactory does a service-loader scan on newInstance() — far too
      * expensive per row, and the factory isn't thread-safe: one per task
      * thread.
      */
    private val factories = ThreadLocal.withInitial[javax.xml.stream.XMLInputFactory] { () =>
      import javax.xml.stream.XMLInputFactory
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
      f
    }
  }

  /** Cosine similarity over two float-array embeddings, in one fused loop.
    * Arithmetic is EXACTLY the sequential-double-fold the declarative
    * formulation (VectorFunctions.cosine) and the DuckDB oracle
    * (list_reduce) perform — left-to-right adds, per-element double casts —
    * so swapping it in cannot change a single output bit; it only removes
    * the interpreted lambda overhead from the ANN hot path.
    */
  case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    // eval reads elements with ArrayData.getFloat — anything but
    // array<float> must be an analysis error, not silent garbage
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y
        i += 1
      }
      i = 0
      while (i < a.numElements()) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
      i = 0
      while (i < b.numElements()) { val y = b.getFloat(i).toDouble; nb += y * y; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
    override def prettyName: String = "graft_cosine"
  }

  // ---- r12: native integer vector math for the quantization/ANN family ----
  // Each expression is the one-loop twin of an `aggregate(zip_with(...))` /
  // argmin-over-struct-array HOF chain that Spark evaluates INTERPRETED in
  // the per-row hot path (the standing r12 rule: no HOF in a hot path).
  // Semantics mirror the declarative forms exactly — including the
  // zip_with null-padding contract (length mismatch or a null element ⇒
  // null result for the folds) and the lowest-index tie-break of
  // array_min over (d2, cid) structs — and are spec-pinned against the
  // retained declarative twins on randomized inputs (NativeVecSpec).

  sealed abstract class LongArrayFold extends
      org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true
        case _                      => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  /** Σ (a_i − b_i)² over two long arrays — null on length mismatch or a
    * null element, like the declarative fold.
    */
  case class L2SqLL(left: Expression, right: Expression) extends LongArrayFold {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      var acc = 0L; var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqLL =
      copy(left = l, right = r)
    override def prettyName: String = "graft_l2sq_ll"
  }

  /** Σ a_i · b_i over two long arrays. */
  case class DotLL(left: Expression, right: Expression) extends LongArrayFold {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      var acc = 0L; var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getLong(i) * b.getLong(i); i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLL =
      copy(left = l, right = r)
    override def prettyName: String = "graft_dot_ll"
  }

  /** Elementwise a − b over two long arrays; mirrors zip_with's padding
    * (output length = max, padded positions null).
    */
  case class SubLL(left: Expression, right: Expression) extends LongArrayFold {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      val n = math.max(na, nb)
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (i >= na || i >= nb || a.isNullAt(i) || b.isNullAt(i)) null
          else a.getLong(i) - b.getLong(i)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SubLL =
      copy(left = l, right = r)
    override def prettyName: String = "graft_sub_ll"
  }

  /** Σ int(a_i) · int(b_i) over two int8 code arrays (the scalar-quant
    * similarity scan).
    */
  case class DotCodesI(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(ByteType, _) => true
        case _                      => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot_codes requires two array<tinyint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      var acc = 0; var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getByte(i).toInt * b.getByte(i).toInt; i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotCodesI =
      copy(left = l, right = r)
    override def prettyName: String = "graft_dot_codes"
  }

  /** Σ popcount(a_i XOR b_i) over two packed-word arrays (1-bit Hamming). */
  case class HammingWords(left: Expression, right: Expression) extends LongArrayFold {
    override def dataType: DataType = IntegerType
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (b.numElements() != n) return null
      var acc = 0; var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingWords =
      copy(left = l, right = r)
    override def prettyName: String = "graft_hamming_words"
  }

  /** Argmin cell of a micro-unit vector against `k` literal centroids
    * (flattened row-major): struct(d2, cid), lowest d2 with lowest-cid
    * ties — the KMeans.bestOf contract in one loop.
    */
  case class BestCell(child: Expression, flat: Array[Long], k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1 && flat.length % k == 0, s"bad centroid table: ${flat.length} longs / $k cells")
    private val dim = flat.length / k
    override def dataType: DataType = StructType(Seq(
      StructField("d2", LongType, nullable = false),
      StructField("cid", IntegerType, nullable = false)))
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_best_cell requires array<bigint>, got ${other.simpleString}")
      }
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != dim) return null
      var best = Long.MaxValue; var bc = 0
      var c = 0
      while (c < k) {
        var d2 = 0L; var i = 0; val base = c * dim
        while (i < dim) { val d = v.getLong(i) - flat(base + i); d2 += d * d; i += 1 }
        if (d2 < best) { best = d2; bc = c }
        c += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(best, bc)
    }
    override protected def withNewChildInternal(newChild: Expression): BestCell = copy(child = newChild)
    override def prettyName: String = "graft_best_cell"
  }

  /** Per-subspace PQ code assignment against literal codebooks (flattened
    * [s][c][i] row-major): array of m argmin cids, lowest-cid ties.
    */
  case class PqCodesExpr(child: Expression, flat: Array[Long], m: Int, ksub: Int)
      extends UnaryExpression with CodegenFallback {
    require(m >= 1 && ksub >= 1 && flat.length % (m * ksub) == 0,
      s"bad codebook table: ${flat.length} longs / $m subspaces / $ksub cells")
    private val subDim = flat.length / (m * ksub)
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_codes requires array<bigint>, got ${other.simpleString}")
      }
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != m * subDim) return null
      val out = new Array[Int](m)
      var s = 0
      while (s < m) {
        var best = Long.MaxValue; var bc = 0
        var c = 0
        while (c < ksub) {
          var d2 = 0L; var i = 0; val base = (s * ksub + c) * subDim
          while (i < subDim) {
            val d = v.getLong(s * subDim + i) - flat(base + i); d2 += d * d; i += 1
          }
          if (d2 < best) { best = d2; bc = c }
          c += 1
        }
        out(s) = bc; s += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): PqCodesExpr = copy(child = newChild)
    override def prettyName: String = "graft_pq_codes"
  }

  /** ADC distance: Σ over dims of (v_i − book[s][code_s][i])², v the raw
    * micro-unit (or residual) vector, codes the m-code array.
    */
  case class PqAdcExpr(left: Expression, right: Expression, flat: Array[Long], m: Int, ksub: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    require(m >= 1 && ksub >= 1 && flat.length % (m * ksub) == 0,
      s"bad codebook table: ${flat.length} longs / $m subspaces / $ksub cells")
    private val subDim = flat.length / (m * ksub)
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_pq_adc requires (array<bigint>, array<int>), got " +
            s"${l.simpleString} and ${r.simpleString}")
      }
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val v = l.asInstanceOf[ArrayData]; val cids = r.asInstanceOf[ArrayData]
      if (v.numElements() != m * subDim || cids.numElements() != m) return null
      var acc = 0L; var s = 0
      while (s < m) {
        if (cids.isNullAt(s)) return null
        var i = 0
        while (i < subDim) {
          if (v.isNullAt(s * subDim + i)) return null
          val d = v.getLong(s * subDim + i) - flat((s * ksub + cids.getInt(s)) * subDim + i)
          acc += d * d; i += 1
        }
        s += 1
      }
      acc
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
      copy(left = l, right = r)
    override def prettyName: String = "graft_pq_adc"
  }

  /** Sign-bit LSH bucket over an array<float> embedding — the native twin
    * of VectorFunctions.lshBucketDeclarative, bit-identical by
    * construction: plane component (p, j) is
    * `md5_number_lower("p:j") % 1000 / 1000.0 - 0.5` (the cross-engine
    * md5 formula DuckDB reproduces), the projection folds left-to-right
    * in double. Plane values are data-independent and cached per thread.
    */
  case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_bucket requires array<float>, got ${other.simpleString}")
      }
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = v.numElements()
      if (nPlanes <= 0) return 0L
      val planes = LshBucket.planesFor(nPlanes, n)
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val row = planes(p)
        var acc = 0.0
        var j = 0
        while (j < n) { acc += v.getFloat(j).toDouble * row(j); j += 1 }
        if (acc > 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
    override protected def withNewChildInternal(newChild: Expression): LshBucket = copy(child = newChild)
    override def prettyName: String = "graft_lsh_bucket"
  }

  /** Multi-table hyperplane LSH keys — the OR-of-ANDs analogue of
    * [[BandKeysExpr]] for embeddings. Key t packs the table index over the
    * sign bits of hyperplanes [t·k, t·k+k): `(t << k) | bits`, so one long
    * column carries (table, k-plane signature) identity and a plain
    * equi-join on the exploded keys reproduces exactly "∃ table whose k
    * planes all agree" — OR of ANDs, the hyperplane twin of banded minhash.
    * The plane family is the SAME md5-derived global sequence as
    * [[LshBucket]] (table t owns global planes t·k..t·k+k−1), so
    * nTables=1 reproduces the single-table bucket bits verbatim and DuckDB
    * re-derives every key value bit-exactly. k=0 degenerates to key=t for
    * every vector — all pairs collide, i.e. exact brute force.
    */
  case class LshKeys(child: Expression, nTables: Int, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(nTables >= 1 && k >= 0 && k < 56,
      s"nTables must be >= 1 and 0 <= planes/table < 56, got $nTables/$k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_lsh_keys requires array<float>, got ${other.simpleString}")
      }
    override protected def nullSafeEval(input: Any): Any = {
      val out = new Array[Long](nTables)
      if (k == 0) {
        var t = 0
        while (t < nTables) { out(t) = t.toLong; t += 1 }
        return new GenericArrayData(out)
      }
      val v = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = v.numElements()
      val planes = LshBucket.planesFor(nTables * k, n)
      var t = 0
      while (t < nTables) {
        var bits = 0L
        var p = 0
        while (p < k) {
          val row = planes(t * k + p)
          var acc = 0.0
          var j = 0
          while (j < n) { acc += v.getFloat(j).toDouble * row(j); j += 1 }
          if (acc > 0) bits |= (1L << p)
          p += 1
        }
        out(t) = (t.toLong << k) | bits
        t += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): LshKeys = copy(child = newChild)
    override def prettyName: String = "graft_lsh_keys"
  }

  object LshBucket {
    // per-thread grow-on-demand plane matrix (plane values are pure
    // functions of (p, j) — identical across threads, so racing is benign
    // but ThreadLocal avoids synchronization entirely)
    private val cache = ThreadLocal.withInitial[java.util.HashMap[Integer, Array[Array[Double]]]](
      () => new java.util.HashMap[Integer, Array[Array[Double]]]())

    /** md5_number_lower("p:j") % 1000 / 1000.0 - 0.5 — unsigned mod of the
      * shared cross-engine md5 uint64 (matches Sampling.md5Bucket / DuckDB
      * bit-exactly).
      */
    private def component(p: Int, j: Int): Double =
      java.lang.Long.remainderUnsigned(NativeHash.md5Lower64(s"$p:$j"), 1000L) / 1000.0 - 0.5

    private[plans] def planesFor(nPlanes: Int, dim: Int): Array[Array[Double]] = {
      val m = cache.get()
      val cur = m.get(nPlanes)
      if (cur != null && cur(0).length >= dim) cur
      else {
        val fresh = Array.tabulate(nPlanes, math.max(dim, 64))((p, j) => component(p, j))
        m.put(nPlanes, fresh)
        fresh
      }
    }
  }

  /** Intersection SIZE of two SORTED, duplicate-free string arrays in one
    * merge scan over the raw UTF8String elements — no hash set, no output
    * array, no String conversion. Replaces `size(array_intersect(a, b))`
    * in the jaccard-verify hot path, where it runs once per candidate pair
    * (millions of times on dense corpora). Caller contract: both arrays
    * ascending by Spark's binary string order (sort_array) and distinct —
    * exactly what Dedup's canonicalization produces.
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(StringType, _) => true
        case _                        => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_sorted_isect requires two array<string> arguments")
    }
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var n = 0
      while (i < na && j < nb) {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      n
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
      copy(left = l, right = r)
    override def prettyName: String = "graft_sorted_isect"
  }

  /** Shared machinery for the early-exit jaccard threshold expressions:
    * jaccard is monotonically increasing in the intersection count n
    * (j(n) = n/(na+nb−n)), so "j ≥ t" is equivalent to "n ≥ n_req" for an
    * integer n_req computed ONCE per pair — found by algebra
    * (n ≥ t·(na+nb)/(1+t)) then fixed up with the EXACT double predicate
    * (`n/(na+nb−n) ≥ t` on ints cast to double, the same arithmetic as
    * the post-hoc Column filter), so every per-element loop check is a
    * pure int compare and the verdict is bit-identical to computing the
    * full intersection first. Fuzz-proven equivalent in LlmOpsSpec.
    */
  private[plans] trait JaccardThreshold {
    def thresholdExpr: Expression
    protected lazy val t: Double = thresholdExpr.eval().asInstanceOf[Double]

    /** Smallest n with n/(s−n) ≥ t, or min(na,nb)+1 when no achievable n
      * qualifies (s = na+nb; callers treat n_req > min(na,nb) as "cannot
      * pass"). Starts two below the algebraic bound to absorb float slop,
      * ascends with the exact predicate.
      */
    protected final def nReq(na: Int, nb: Int): Int = {
      val s = na + nb
      val cap = math.min(na, nb)
      var req = math.max(0, math.ceil(t * s / (1.0 + t)).toInt - 2)
      while (req <= cap && !(req.toDouble / (s - req).toDouble >= t)) req += 1
      req
    }
  }

  /** Early-exit jaccard threshold TEST over two SORTED DISTINCT string
    * arrays: true ⟺ |A∩B| / |A∪B| ≥ t, decided mid-merge-scan the moment
    * the verdict is forced — early-true once the running count reaches
    * n_req, early-false once even matching every remaining element can't.
    * On LSH candidate streams where most pairs fail the threshold (the
    * normal case — candidates are recall-biased) the scan exits in a
    * fraction of the merge: the incremental-dedup probe at sf0.1 (~3.1M
    * candidate pairs, ~1k true hits) halves end-to-end. Use where only
    * the verdict matters; [[SortedIntersectGe]] where the exact count is
    * also needed.
    */
  case class JaccardGe(left: Expression, right: Expression, thresholdExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback with JaccardThreshold {
    override def first: Expression = left
    override def second: Expression = right
    override def third: Expression = thresholdExpr
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val arraysOk = Seq(left, right).forall(_.dataType match {
        case ArrayType(StringType, _) => true
        case _                        => false
      })
      if (arraysOk && thresholdExpr.dataType == DoubleType && thresholdExpr.foldable)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_jaccard_ge requires two array<string> arguments and a foldable double threshold")
    }
    override protected def nullSafeEval(l: Any, r: Any, @annotation.unused tv: Any): Any = {
      val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      val req = nReq(na, nb)
      if (req > math.min(na, nb)) return false
      var i = 0; var j = 0; var n = 0
      while (i < na && j < nb) {
        if (n >= req) return true
        if (n + math.min(na - i, nb - j) < req) return false
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      n >= req
    }
    override protected def withNewChildrenInternal(f: Expression, s: Expression, th: Expression): JaccardGe =
      copy(left = f, right = s, thresholdExpr = th)
    override def prettyName: String = "graft_jaccard_ge"
  }

  /** Early-exit jaccard threshold test that ALSO returns the exact
    * intersection count: −1 if |A∩B|/|A∪B| < t (decided as early as the
    * bound allows — failing pairs never finish the merge), else the exact
    * |A∩B| from the single completed scan. For verify stages that output
    * the jaccard VALUE for survivors: passing pairs pay exactly one full
    * merge (the same work as [[SortedIntersectSize]] alone), failing
    * pairs strictly less — never a second scan.
    */
  case class SortedIntersectGe(left: Expression, right: Expression, thresholdExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback with JaccardThreshold {
    override def first: Expression = left
    override def second: Expression = right
    override def third: Expression = thresholdExpr
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val arraysOk = Seq(left, right).forall(_.dataType match {
        case ArrayType(StringType, _) => true
        case _                        => false
      })
      if (arraysOk && thresholdExpr.dataType == DoubleType && thresholdExpr.foldable)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_sorted_isect_ge requires two array<string> arguments and a foldable double threshold")
    }
    override protected def nullSafeEval(l: Any, r: Any, @annotation.unused tv: Any): Any = {
      val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      val req = nReq(na, nb)
      if (req > math.min(na, nb)) return -1
      var i = 0; var j = 0; var n = 0
      while (i < na && j < nb) {
        if (n + math.min(na - i, nb - j) < req) return -1
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      if (n >= req) n else -1
    }
    override protected def withNewChildrenInternal(f: Expression, s: Expression, th: Expression): SortedIntersectGe =
      copy(left = f, right = s, thresholdExpr = th)
    override def prettyName: String = "graft_sorted_isect_ge"
  }

  /** Distinct word n-gram shingles in one native pass. The declarative
    * `transform(sequence(…), i => array_join(slice(…)))` higher-order
    * function evaluates interpreted and allocates a fresh slice per
    * position — measured ~10× slower on the decontamination probe at
    * sf0.1. Docs with < n tokens contribute their whole token stream as
    * ONE shingle (TextFunctions.wordShingles parity; empty text → the ""
    * shingle, like the declarative form and the DuckDB mirror). `sep`
    * joins the tokens of a shingle — " " matches wordShingles; "\u0001" is
    * the Dedup.setUnits form (each shingle must stay ONE non-whitespace
    * token for minhashSignature's downstream re-tokenization), identical
    * to `translate(shingle, " ", "\u0001")` because tokens never contain
    * whitespace.
    */
  case class ShingleSet(child: Expression, n: Int, sep: String = " ")
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      val out = new java.util.LinkedHashSet[UTF8String]()
      if (toks.length < n) out.add(UTF8String.fromString(toks.mkString(sep)))
      else {
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(sep)
            sb.append(toks(i + j))
            j += 1
          }
          out.add(UTF8String.fromString(sb.toString))
          i += 1
        }
      }
      new GenericArrayData(out.toArray[AnyRef](new Array[AnyRef](out.size())))
    }
    override protected def withNewChildInternal(newChild: Expression): ShingleSet = copy(child = newChild)
  }

  /** ALL word n-gram shingles — ordered, duplicates kept — in one native
    * pass: the counting twin of [[ShingleSet]] (boilerplate n-gram reports
    * count every occurrence, so distinctness would be wrong). Same
    * tokenizer, space-joined, but NO whole-stream fallback: a doc with
    * fewer than n tokens yields an EMPTY array, so
    * `explode(graft_shingle_list(c, n))` is exactly the
    * `filter(size(tokens) >= n)` + `explode(wordShingles)` pair in one
    * tokenization (the pre-filter used to tokenize every doc a second
    * time).
    */
  case class ShingleList(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val toks0 = tokenize(input.asInstanceOf[UTF8String])
      // split("", "\s+") is [""]: empty text is ONE empty token to the
      // declarative filter+explode pair, so n=1 emits the "" gram
      val toks = if (toks0.isEmpty) Array("") else toks0
      if (toks.length < n) return new GenericArrayData(Array.empty[AnyRef])
      val out = new Array[AnyRef](toks.length - n + 1)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): ShingleList = copy(child = newChild)
  }

  /** `md5_number_lower(s) % m` (unsigned) in one native pass — value-
    * identical to the declarative [[graft.functions.Sampling.md5Lower]]
    * route (byte-reversed-hex → conv → decimal(20,0) → pmod), which pays a
    * hex round-trip, string concat, and decimal arithmetic per call. This
    * is the sketch hot path: Count-Min hashes every TOKEN OCCURRENCE d
    * times, and the memoized digest (vocab ≪ stream) makes repeated tokens
    * ~free. Unsigned mod over the signed long via Long.remainderUnsigned ==
    * pmod over the unsigned decimal.
    */
  case class Md5Mod(child: Expression, m: Long) extends UnaryExpression with CodegenFallback {
    require(m > 0, s"modulus must be positive, got $m")
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_md5_mod requires a string input, got ${child.dataType.catalogString}")
    override protected def nullSafeEval(input: Any): Any =
      java.lang.Long.remainderUnsigned(md5Lower64(input.asInstanceOf[UTF8String].toString), m)
    override protected def withNewChildInternal(newChild: Expression): Md5Mod = copy(child = newChild)
    override def prettyName: String = "graft_md5_mod"
  }

  /** Banded LSH bucket keys over a minhash signature in one pass —
    * semantics identical to the declarative form in
    * [[graft.operators.Dedup.bandKeys]]: band i's key folds signature
    * values [i·r, i·r+r) into acc = acc·1000003 + v seeded by (i+1). The
    * HOF chain (transform+aggregate+slice) evaluates interpreted per band
    * per doc; this is one flat loop over the signature array. Runs in
    * every minhash-family plan (candidates, setGraph, the incremental
    * index), i.e. directly under the dedup map stage.
    */
  case class BandKeysExpr(child: Expression, bands: Int, r: Int)
      extends UnaryExpression with CodegenFallback {
    require(bands >= 1 && r >= 1, s"bands/r must be >= 1, got $bands/$r")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "graft_band_keys requires an array<bigint> signature argument")
      }
    override protected def nullSafeEval(input: Any): Any = {
      val sig = input.asInstanceOf[ArrayData]
      val n = sig.numElements()
      val out = new Array[Long](bands)
      var i = 0
      while (i < bands) {
        var acc = (i + 1).toLong
        var j = i * r
        val end = math.min(n, j + r)
        while (j < end) { acc = acc * 1000003L + sig.getLong(j); j += 1 }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): BandKeysExpr = copy(child = newChild)
  }

  /** Consecutive `w`-token spans of the normalized token stream in one
    * pass — the span-dedup segmenter ([[graft.operators.Dedup
    * .removeRepeatedSpans]]). Replaces the interpreted
    * transform(sequence)+array_join(slice) HOF chain (the same win as
    * [[ShingleSet]] for decontamination). Semantics replicate the
    * DECLARATIVE form exactly — split(lower(trim(text)), "\\s+") — and
    * therefore the DuckDB oracle: trim strips 0x20 ONLY (Spark/DuckDB
    * trim), and split keeps a leading empty token for text starting with
    * non-space whitespace (Java regex split, limit −1), so empty text is
    * one empty span. Trailing short span counts.
    */
  case class TokenSpans(child: Expression, w: Int) extends UnaryExpression with CodegenFallback {
    require(w >= 1, s"span width must be >= 1, got $w")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_token_spans requires a string argument")
    override protected def nullSafeEval(input: Any): Any = {
      // UTF8String.toLowerCase = Spark lower() semantics (locale-immune
      // ASCII path) — keeps the documented equivalence with the
      // declarative split(lower(trim(text))) form on any JVM locale
      val str = input.asInstanceOf[UTF8String].toLowerCase.toString
      var b = 0
      var e = str.length
      while (b < e && str.charAt(b) == ' ') b += 1
      while (e > b && str.charAt(e - 1) == ' ') e -= 1
      val toks = str.substring(b, e).split("\\s+", -1)
      val nSpans = (toks.length + w - 1) / w // toks.length >= 1 ("" splits to [""])
      val out = new Array[AnyRef](nSpans)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < nSpans) {
        sb.setLength(0)
        var j = i * w
        val end = math.min(toks.length, j + w)
        while (j < end) {
          if (j > i * w) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): TokenSpans = copy(child = newChild)
  }

  /** `graft_token_grams(text, n)` — md5 hex of every SLIDING n-token gram
    * (space-joined, shared whitespace tokenization): element j =
    * md5(tokens[j..j+n)), array length max(0, |tokens| − n + 1), EMPTY
    * when the document has fewer than n tokens. One native pass per doc —
    * the candidate generator of variable-length substring dedup
    * ([[graft.operators.Dedup.removeRepeatedSubstrings]]). md5 (not a
    * rolling hash) because it is the cross-engine family the DuckDB
    * oracle replays verbatim; the O(|doc|·n) bytes hashed are the
    * documented cost of gram-granular dedup.
    */
  case class TokenGramHashes(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
    require(n >= 1, s"gram width must be >= 1, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_token_grams requires a string argument")
    override protected def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      if (toks.length < n) return new GenericArrayData(Array.empty[AnyRef])
      val out = new Array[AnyRef](toks.length - n + 1)
      val md = md5s.get()
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < out.length) {
        sb.setLength(0)
        var k = j
        while (k < j + n) {
          if (k > j) sb.append(' ')
          sb.append(toks(k))
          k += 1
        }
        md.reset()
        val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hex = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hex(b * 2) = Character.forDigit((d(b) >> 4) & 0xf, 16)
          hex(b * 2 + 1) = Character.forDigit(d(b) & 0xf, 16)
          b += 1
        }
        out(j) = UTF8String.fromString(new String(hex))
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): TokenGramHashes = copy(child = newChild)
  }

  /** `graft_cdc_cuts(text, k, maskHex)` — 1-based char positions i where
    * md5 of the k-char window ending at i starts with `maskHex`: the CDC
    * boundary rule ([[graft.operators.Cdc]]) in ONE native pass. The
    * declarative `filter(sequence(...), md5(substr(...)))` formulation is
    * result-identical but pays an interpreted md5+substr+encode chain per
    * CHARACTER (measured ~8× this expression); here the code-point array
    * decodes once and a thread-local digest is reused per window. Windows
    * are CODE POINTS (Spark `substr` semantics), so the replay contract
    * with the SQL oracle is unchanged byte for byte.
    */
  case class CdcCuts(child: Expression, k: Int, maskHex: String)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1, s"window must be >= 1, got $k")
    require(maskHex.nonEmpty && maskHex.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      s"maskHex must be lowercase hex, got '$maskHex'")
    // an md5 digest is 32 nibbles — a longer mask would index past the
    // 16-byte digest at eval time (the declarative form just never cut)
    require(maskHex.length <= 32,
      s"maskHex longer than an md5 digest (32 hex chars): '$maskHex'")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_cdc_cuts requires a string argument")
    override protected def nullSafeEval(input: Any): Any = {
      val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
      val n = cps.length
      if (n < k) return new GenericArrayData(Array.empty[Int])
      val md = md5s.get()
      val out = new java.util.ArrayList[Integer]()
      val nibbles = maskHex.length
      val maskBytes = new Array[Int](nibbles)
      var m = 0
      while (m < nibbles) { m += 1; maskBytes(m - 1) = Character.digit(maskHex(m - 1), 16) }
      var i = k
      while (i <= n) {
        val w = new String(cps, i - k, k)
        md.reset()
        val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var ok = true
        var b = 0
        while (ok && b < nibbles) {
          val nib = if (b % 2 == 0) (d(b / 2) >> 4) & 0xf else d(b / 2) & 0xf
          ok = nib == maskBytes(b)
          b += 1
        }
        if (ok) out.add(i)
        i += 1
      }
      val arr = new Array[Int](out.size)
      var j = 0
      while (j < arr.length) { arr(j) = out.get(j); j += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(newChild: Expression): CdcCuts = copy(child = newChild)
  }

  /** Per-document top-n-gram frequency ratio in one pass — the shuffle-free
    * form of the Gopher repetition gate. The explode+groupBy formulation
    * shuffles every n-gram twice; this computes `(max count / total, total)`
    * inside the row with a local hashmap. Returns
    * struct<ratio double, total bigint>; null when fewer than n tokens.
    */
  case class TopNgramRatio(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("ratio", DoubleType, nullable = false),
      StructField("total", LongType, nullable = false)))
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      if (toks.length < n) return null
      val counts = new java.util.HashMap[String, Int]()
      var maxCount = 0
      var i = 0
      while (i <= toks.length - n) {
        val g = toks.slice(i, i + n).mkString(" ")
        val c = counts.merge(g, 1, (a, b) => a + b)
        if (c > maxCount) maxCount = c
        i += 1
      }
      val total = (toks.length - n + 1).toLong
      org.apache.spark.sql.catalyst.InternalRow(maxCount.toDouble / total.toDouble, total)
    }
    override protected def withNewChildInternal(newChild: Expression): TopNgramRatio = copy(child = newChild)
  }

  /** Hilbert xy→d walk (the [[graft.operators.Layout.hilbertValue]]
    * semantics) as ONE native integer loop per row. The declarative
    * formulation — `aggregate()` over a 16-level array with a struct
    * accumulator — is a higher-order function Spark evaluates INTERPRETED
    * (~µs/row with per-level struct allocation), and under
    * `Scale.globalRowNumber` it runs twice (range-boundary sampling + the
    * shuffle itself): measured 278 s cold for `q_hilbert_layout` at the
    * ×10 corpus, vs nanoseconds/row for this loop. Identical walk, level
    * s = 2^(bits−1)..1: d += s²·((3·rx) xor ry), then reflect-and-swap
    * when ry = 0 — bit-for-bit the fold the DuckDB CTE chain replays.
    */
  case class HilbertD(left: Expression, right: Expression, bits: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType == LongType)
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert_d requires two bigint arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      var x = l.asInstanceOf[Long]
      var y = r.asInstanceOf[Long]
      var d = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0L) {
          // reflect within the quadrant when rx = 1, then swap axes —
          // exactly the fold's nx/ny: x' = (rx? s−1−y : y), y' = (rx? s−1−x : x)
          if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertD =
      copy(left = l, right = r)
    override def prettyName: String = "graft_hilbert_d"
  }

  /** Column API over the injected functions (sessions built through
    * GraftSession carry [[GraftExtensions]]; other sessions set
    * `spark.sql.extensions=graft.plans.GraftExtensions`).
    */
  def simhash64(c: Column): Column = call_function("graft_simhash64", c)

  def minhashSignature(c: Column, k: Int): Column = call_function("graft_minhash", c, lit(k))

  def morrisParse(c: Column): Column = call_function("graft_morris_parse", c)

  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  def topNgramRatio(c: Column, n: Int): Column = call_function("graft_top_ngram_ratio", c, lit(n))

  def shingleSet(c: Column, n: Int): Column = call_function("graft_shingle_set", c, lit(n))

  def shingleSetSep(c: Column, n: Int, sep: String): Column =
    call_function("graft_shingle_set", c, lit(n), lit(sep))

  def shingleList(c: Column, n: Int): Column = call_function("graft_shingle_list", c, lit(n))

  def tokenSpans(c: Column, w: Int): Column = call_function("graft_token_spans", c, lit(w))

  def tokenGramHashes(c: Column, n: Int): Column = call_function("graft_token_grams", c, lit(n))

  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    call_function("graft_band_keys", sig, lit(bands), lit(r))

  def sortedIntersectSize(a: Column, b: Column): Column = call_function("graft_sorted_isect", a, b)

  def jaccardGe(a: Column, b: Column, threshold: Double): Column =
    call_function("graft_jaccard_ge", a, b, lit(threshold))

  def sortedIntersectGe(a: Column, b: Column, threshold: Double): Column =
    call_function("graft_sorted_isect_ge", a, b, lit(threshold))

  def lshBucket(v: Column, nPlanes: Int): Column = call_function("graft_lsh_bucket", v, lit(nPlanes))

  def lshKeys(v: Column, nTables: Int, k: Int): Column =
    call_function("graft_lsh_keys", v, lit(nTables), lit(k))

  def md5Mod(c: Column, m: Long): Column = call_function("graft_md5_mod", c, lit(m))

  def cdcCuts(c: Column, k: Int, maskHex: String): Column =
    call_function("graft_cdc_cuts", c, lit(k), lit(maskHex))

  def hilbertD(x: Column, y: Column, bits: Int): Column =
    call_function("graft_hilbert_d", x.cast("long"), y.cast("long"), lit(bits))

  def l2sqLL(a: Column, b: Column): Column = call_function("graft_l2sq_ll", a, b)

  def dotLL(a: Column, b: Column): Column = call_function("graft_dot_ll", a, b)

  def subLL(a: Column, b: Column): Column = call_function("graft_sub_ll", a, b)

  def dotCodes(a: Column, b: Column): Column = call_function("graft_dot_codes", a, b)

  def hammingWords(a: Column, b: Column): Column = call_function("graft_hamming_words", a, b)

  def bestCell(qv: Column, cents: Array[Array[Long]]): Column =
    call_function("graft_best_cell", qv,
      org.apache.spark.sql.functions.typedLit(cents.flatten.toSeq), lit(cents.length))

  def pqCodes(qv: Column, books: Array[Array[Array[Long]]]): Column =
    call_function("graft_pq_codes", qv,
      org.apache.spark.sql.functions.typedLit(books.flatten.flatten.toSeq),
      lit(books.length), lit(books(0).length))

  def pqAdc(qv: Column, cids: Column, books: Array[Array[Array[Long]]]): Column =
    call_function("graft_pq_adc", qv, cids,
      org.apache.spark.sql.functions.typedLit(books.flatten.flatten.toSeq),
      lit(books.length), lit(books(0).length))

  /** Extract a foldable array<bigint> argument into a driver array at
    * function-resolution time (the literal-codebook calling convention of
    * graft_best_cell / graft_pq_codes / graft_pq_adc).
    */
  private[plans] def litLongs(e: Expression): Array[Long] = {
    require(e.foldable, s"codebook argument must be foldable, got $e")
    e.eval().asInstanceOf[ArrayData].toLongArray()
  }
}

/** SparkSessionExtensions entry point registering graft's native
  * expressions — the public, spark-submit-compatible way to put custom
  * Catalyst expressions on the analyzer's function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => JaccardPruneRule)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[NativeHash.SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => NativeHash.SimHash64(args.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[NativeHash.MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) =>
        NativeHash.MinHashSignature(args.head, args(1).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_morris_parse"),
      new ExpressionInfo(classOf[NativeHash.MorrisParse].getName, "graft_morris_parse"),
      (args: Seq[Expression]) => NativeHash.MorrisParse(args.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_top_ngram_ratio"),
      new ExpressionInfo(classOf[NativeHash.TopNgramRatio].getName, "graft_top_ngram_ratio"),
      (args: Seq[Expression]) => NativeHash.TopNgramRatio(args.head, args(1).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_set"),
      new ExpressionInfo(classOf[NativeHash.ShingleSet].getName, "graft_shingle_set"),
      (args: Seq[Expression]) => NativeHash.ShingleSet(args.head, args(1).eval().asInstanceOf[Int],
        if (args.length >= 3) args(2).eval().toString else " ")
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_list"),
      new ExpressionInfo(classOf[NativeHash.ShingleList].getName, "graft_shingle_list"),
      (args: Seq[Expression]) => NativeHash.ShingleList(args.head, args(1).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_token_spans"),
      new ExpressionInfo(classOf[NativeHash.TokenSpans].getName, "graft_token_spans"),
      (args: Seq[Expression]) => NativeHash.TokenSpans(args.head, args(1).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_token_grams"),
      new ExpressionInfo(classOf[NativeHash.TokenGramHashes].getName, "graft_token_grams"),
      (args: Seq[Expression]) => NativeHash.TokenGramHashes(args.head, args(1).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_cdc_cuts"),
      new ExpressionInfo(classOf[NativeHash.CdcCuts].getName, "graft_cdc_cuts"),
      (args: Seq[Expression]) => NativeHash.CdcCuts(args.head,
        args(1).eval().asInstanceOf[Int], args(2).eval().toString)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_band_keys"),
      new ExpressionInfo(classOf[NativeHash.BandKeysExpr].getName, "graft_band_keys"),
      (args: Seq[Expression]) => NativeHash.BandKeysExpr(args.head,
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[NativeHash.CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => NativeHash.CosineSim(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_hilbert_d"),
      new ExpressionInfo(classOf[NativeHash.HilbertD].getName, "graft_hilbert_d"),
      (args: Seq[Expression]) => NativeHash.HilbertD(args(0), args(1),
        args(2).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[NativeHash.LshBucket].getName, "graft_lsh_bucket"),
      (args: Seq[Expression]) => NativeHash.LshBucket(args.head, args(1).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_keys"),
      new ExpressionInfo(classOf[NativeHash.LshKeys].getName, "graft_lsh_keys"),
      (args: Seq[Expression]) => NativeHash.LshKeys(args.head,
        args(1).eval().asInstanceOf[Int], args(2).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_mod"),
      new ExpressionInfo(classOf[NativeHash.Md5Mod].getName, "graft_md5_mod"),
      (args: Seq[Expression]) => NativeHash.Md5Mod(args.head,
        args(1).eval() match { case i: Int => i.toLong; case l: Long => l })
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_clean_upc"),
      new ExpressionInfo(classOf[CleanUpcExpr].getName, "graft_clean_upc"),
      (args: Seq[Expression]) => CleanUpcExpr(args.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_clean_int"),
      new ExpressionInfo(classOf[CleanIntegerExpr].getName, "graft_clean_int"),
      (args: Seq[Expression]) => CleanIntegerExpr(args.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_clean_float"),
      new ExpressionInfo(classOf[CleanFloatExpr].getName, "graft_clean_float"),
      (args: Seq[Expression]) => CleanFloatExpr(args.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_isect"),
      new ExpressionInfo(classOf[NativeHash.SortedIntersectSize].getName, "graft_sorted_isect"),
      (args: Seq[Expression]) => NativeHash.SortedIntersectSize(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard_ge"),
      new ExpressionInfo(classOf[NativeHash.JaccardGe].getName, "graft_jaccard_ge"),
      (args: Seq[Expression]) => NativeHash.JaccardGe(args(0), args(1), args(2))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_isect_ge"),
      new ExpressionInfo(classOf[NativeHash.SortedIntersectGe].getName, "graft_sorted_isect_ge"),
      (args: Seq[Expression]) => NativeHash.SortedIntersectGe(args(0), args(1), args(2))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_len"),
      new ExpressionInfo(classOf[Bpe.BpeLen].getName, "graft_bpe_len"),
      (args: Seq[Expression]) => Bpe.BpeLen(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo(classOf[Bpe.BpeTokens].getName, "graft_bpe_tokens"),
      (args: Seq[Expression]) => Bpe.BpeTokens(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_len_bytes"),
      new ExpressionInfo(classOf[Bpe.BpeLenBytes].getName, "graft_bpe_len_bytes"),
      (args: Seq[Expression]) => Bpe.BpeLenBytes(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_tokens_bytes"),
      new ExpressionInfo(classOf[Bpe.BpeTokensBytes].getName, "graft_bpe_tokens_bytes"),
      (args: Seq[Expression]) => Bpe.BpeTokensBytes(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_wordpiece_tokens"),
      new ExpressionInfo(classOf[WordPiece.WpTokens].getName, "graft_wordpiece_tokens"),
      (args: Seq[Expression]) => WordPiece.WpTokens(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_wordpiece_len"),
      new ExpressionInfo(classOf[WordPiece.WpLen].getName, "graft_wordpiece_len"),
      (args: Seq[Expression]) => WordPiece.WpLen(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_unigram_tokens"),
      new ExpressionInfo(classOf[Unigram.UgTokens].getName, "graft_unigram_tokens"),
      (args: Seq[Expression]) => Unigram.UgTokens(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_l2sq_ll"),
      new ExpressionInfo(classOf[NativeHash.L2SqLL].getName, "graft_l2sq_ll"),
      (args: Seq[Expression]) => NativeHash.L2SqLL(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_ll"),
      new ExpressionInfo(classOf[NativeHash.DotLL].getName, "graft_dot_ll"),
      (args: Seq[Expression]) => NativeHash.DotLL(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_sub_ll"),
      new ExpressionInfo(classOf[NativeHash.SubLL].getName, "graft_sub_ll"),
      (args: Seq[Expression]) => NativeHash.SubLL(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_codes"),
      new ExpressionInfo(classOf[NativeHash.DotCodesI].getName, "graft_dot_codes"),
      (args: Seq[Expression]) => NativeHash.DotCodesI(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming_words"),
      new ExpressionInfo(classOf[NativeHash.HammingWords].getName, "graft_hamming_words"),
      (args: Seq[Expression]) => NativeHash.HammingWords(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_best_cell"),
      new ExpressionInfo(classOf[NativeHash.BestCell].getName, "graft_best_cell"),
      (args: Seq[Expression]) => NativeHash.BestCell(args(0),
        NativeHash.litLongs(args(1)), args(2).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_codes"),
      new ExpressionInfo(classOf[NativeHash.PqCodesExpr].getName, "graft_pq_codes"),
      (args: Seq[Expression]) => NativeHash.PqCodesExpr(args(0),
        NativeHash.litLongs(args(1)),
        args(2).eval().asInstanceOf[Int], args(3).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[NativeHash.PqAdcExpr].getName, "graft_pq_adc"),
      (args: Seq[Expression]) => NativeHash.PqAdcExpr(args(0), args(1),
        NativeHash.litLongs(args(2)),
        args(3).eval().asInstanceOf[Int], args(4).eval().asInstanceOf[Int])
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (args: Seq[Expression]) =>
        if (args.size >= 4) TopKAgg(args(0), args(1), args(2), args(3))
        else TopKAgg(args(0), args(1), args(2))
    ))
  }
}
