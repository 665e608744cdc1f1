package graft

import graft.operators.Quant
import org.apache.spark.sql.functions._

/** INT8 scalar quantization (`Quant`): a driver-side reference model pins
  * the pinned-IEEE code chain, range endpoints map to the code extremes,
  * reconstruction error is bounded by half a step, and the quantized ANN
  * recovers planted near-duplicate structure.
  */
class QuantSpec extends SparkSpec {
  import spark.implicits._

  private def codeRef(x: Double, mn: Double, mx: Double): Int =
    if (mx == mn) 0 else (math.round((x - mn) * (254.0 / (mx - mn))) - 127).toInt

  /** Model over a whole corpus: per-dim min/max then per-element codes. */
  private def modelCodes(vs: Seq[(Long, Seq[Float])]): Map[Long, Seq[Int]] = {
    val dim = vs.head._2.length
    val mn = (0 until dim).map(j => vs.map(_._2(j).toDouble).min)
    val mx = (0 until dim).map(j => vs.map(_._2(j).toDouble).max)
    vs.map { case (id, v) =>
      id -> v.indices.map(j => codeRef(v(j).toDouble, mn(j), mx(j)))
    }.toMap
  }

  private def runQuant(vs: Seq[(Long, Seq[Float])]): Map[Long, Seq[Int]] =
    Quant.quantized(vs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getByte(2).toInt))
      .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }

  test("operator matches the reference model; constant dims code to 0; extremes hit ±127") {
    val vs = Seq(
      1L -> Seq(0.0f, 5.0f, -3.5f, 7.7f),
      2L -> Seq(1.0f, 5.0f, 2.5f, -1.1f),
      3L -> Seq(0.25f, 5.0f, 9.0f, 0.0f)) // dim 1 constant
    val got = runQuant(vs)
    assert(got === modelCodes(vs))
    assert(got.values.forall(_(1) == 0), "constant dim must code to 0")
    // per dim, the corpus min codes to -127 and the max to +127
    for (j <- Seq(0, 2, 3)) {
      val col = got.values.map(_(j)).toSeq
      assert(col.min == -127 && col.max == 127, s"dim $j codes: $col")
    }
    assert(got.values.flatten.forall(c => c >= -127 && c <= 127))
  }

  test("reconstruction error is bounded by half a quantization step per element") {
    val vs = (0L until 40L).map(i =>
      i -> (0 until 8).map(j => (math.sin(i * 0.7 + j) * (j + 1)).toFloat).toSeq)
    val dim = 8
    val mn = (0 until dim).map(j => vs.map(_._2(j).toDouble).min)
    val mx = (0 until dim).map(j => vs.map(_._2(j).toDouble).max)
    val got = runQuant(vs)
    for ((id, v) <- vs; j <- 0 until dim) {
      val step = (mx(j) - mn(j)) / 254.0
      val deq = mn(j) + (got(id)(j) + 127) * step
      assert(math.abs(deq - v(j)) <= step / 2 + 1e-12,
        s"id=$id dim=$j x=${v(j)} deq=$deq step=$step")
    }
  }

  test("operator matches the reference model on the real embeddings table") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    assert(runQuant(rows) === modelCodes(rows))
  }

  // ---- reconstruction-error report ----------------------------------------

  test("per-dim error report matches a driver model; errors bounded by half a step in micro-units") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val dim = rows.head._2.length
    val mn = (0 until dim).map(j => rows.map(_._2(j).toDouble).min)
    val mx = (0 until dim).map(j => rows.map(_._2(j).toDouble).max)
    val step = (0 until dim).map(j => (mx(j) - mn(j)) / 254.0)
    val model = (0 until dim).map { j =>
      val errs = rows.map { case (_, v) =>
        val c = codeRef(v(j).toDouble, mn(j), mx(j))
        val deq = mn(j) + (c + 127.0) * step(j)
        math.abs(math.round(v(j).toDouble * 1e6) - math.round(deq * 1e6))
      }
      j -> ((errs.size.toLong, errs.max, errs.sum, errs.sum.toDouble / errs.size))
    }.toMap
    val got = Quant.quantErrorByDim(rows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === model)
    // half-step bound in micro-units (+1 for the double micro-rounding)
    for ((j, (_, mx_u, _, _)) <- got)
      assert(mx_u <= math.round(step(j) / 2 * 1e6) + 1, s"dim $j err $mx_u step ${step(j)}")
  }

  // ---- two-stage prefix-dimension cascade ---------------------------------

  test("prefix cascade matches a driver model on the real embeddings table") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toArray))
    def dot(a: Array[Long], b: Array[Long], n: Int): Long =
      (0 until n).map(i => a(i) * b(i)).sum
    val expected = rows.filter(_._1 < 5).flatMap { case (qid, qv) =>
      val short = rows.filter(_._1 != qid)
        .map { case (nid, cv) => (nid, dot(qv, cv, 16)) }
        .sortBy { case (nid, d) => (-d, nid) }.take(30)
      short.map { case (nid, _) => (nid, dot(qv, rows.find(_._1 == nid).get._2, qv.length)) }
        .sortBy { case (nid, d) => (-d, nid) }.take(10).zipWithIndex
        .map { case ((nid, d), i) => (qid, nid) -> ((d, i + 1)) }
    }.toMap
    val got = Quant.annTopKPrefix(
        spark.read.parquet(s"$sfDir/embeddings.parquet").filter(col("vec_id") < 5),
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", "embedding", prefixDim = 16, c = 30, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(got === expected)
  }

  test("prefix cascade recovers planted twins through the truncated stage") {
    def mdVal(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 15
      while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
      java.lang.Long.remainderUnsigned(v, 2000L) / 1000.0 - 1.0
    }
    val dim = 32
    val base = Array.tabulate(60, dim)((i, j) => mdVal(s"vec$i:$j").toFloat)
    val twin = Array.tabulate(30, dim)((i, j) => (base(i)(j) + 0.05 * mdVal(s"noise$i:$j")).toFloat)
    val all = (base ++ twin).zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("vec_id", "embedding")
    val top1 = Quant.annTopKPrefix(all.filter(col("vec_id") >= 60), all,
        "vec_id", "embedding", prefixDim = 8, c = 10, k = 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 30).count(i => top1(60L + i) == i.toLong)
    assert(hits >= 25, s"prefix-cascade top-1 recall too low: $hits/30")
  }

  // ---- 1-bit sign quantization --------------------------------------------

  /** Driver reference: midrange thresholds then the acc·2+bit fold per
    * 32-dim word — the exact contract `signWords` pins.
    */
  private def modelWords(vs: Seq[(Long, Seq[Float])]): Map[Long, Seq[Long]] = {
    val dim = vs.head._2.length
    val mid = (0 until dim).map { j =>
      val col = vs.map(_._2(j).toDouble)
      (col.min + col.max) / 2.0
    }
    val nWords = (dim + 31) / 32
    vs.map { case (id, v) =>
      id -> (0 until nWords).map { w =>
        val hi = math.min((w + 1) * 32, dim)
        (w * 32 until hi).foldLeft(0L)((acc, j) =>
          acc * 2 + (if (v(j).toDouble > mid(j)) 1L else 0L))
      }
    }.toMap
  }

  private def runBinary(vs: Seq[(Long, Seq[Float])]): Map[Long, Seq[Long]] =
    Quant.binarized(vs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }

  test("sign words match the reference fold; constant dims bit to 0; partial last word") {
    // dim 40: one full 32-bit word + one 8-bit tail word per vector
    val vs = (0L until 25L).map(i =>
      i -> (0 until 40).map(j =>
        if (j == 7) 0.5f else (math.cos(i * 1.3 + j * 0.41) * (j % 4 + 1)).toFloat).toSeq)
    val got = runBinary(vs)
    assert(got === modelWords(vs))
    assert(got.values.forall(_.length == 2))
    // constant dim 7 codes to bit 0 in every vector: mask bit (31-7) of word 0
    assert(got.values.forall(w => ((w(0) >> (31 - 7)) & 1L) == 0L))
    // tail word uses only 8 bits
    assert(got.values.forall(w => w(1) >= 0L && w(1) < 256L))
  }

  test("sign words match the reference model on the real embeddings table") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    assert(runBinary(rows) === modelWords(rows))
  }

  test("Hamming ANN recovers planted twins through the 1-bit codes") {
    def mdVal(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 15
      while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
      java.lang.Long.remainderUnsigned(v, 2000L) / 1000.0 - 1.0
    }
    val dim = 64
    val base = Array.tabulate(60, dim)((i, j) => mdVal(s"vec$i:$j").toFloat)
    val twin = Array.tabulate(30, dim)((i, j) => (base(i)(j) + 0.05 * mdVal(s"noise$i:$j")).toFloat)
    val all = (base ++ twin).zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("vec_id", "embedding")
    val top1 = Quant.annTopKHamming(all.filter(col("vec_id") >= 60), all,
        "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 30).count(i => top1(60L + i) == i.toLong)
    assert(hits >= 24, s"Hamming top-1 recall too low: $hits/30")
  }

  test("quantized ANN recovers planted twins; integer dot ranking is deterministic") {
    // the VectorLshSpec planted corpus shape: 60 base + 30 twins at 5%
    // noise (cosine ≈ 0.998); background pairs far apart
    def mdVal(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 15
      while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
      java.lang.Long.remainderUnsigned(v, 2000L) / 1000.0 - 1.0
    }
    val dim = 32
    val base = Array.tabulate(60, dim)((i, j) => mdVal(s"vec$i:$j").toFloat)
    val twin = Array.tabulate(30, dim)((i, j) => (base(i)(j) + 0.05 * mdVal(s"noise$i:$j")).toFloat)
    val all = (base ++ twin).zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("vec_id", "embedding")
    val top1 = Quant.annTopKQuantized(all.filter(col("vec_id") >= 60), all,
        "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each twin 60+i must retrieve its base i at top-1 through int8 codes
    val hits = (0 until 30).count(i => top1(60L + i) == i.toLong)
    assert(hits >= 27, s"quantized top-1 recall too low: $hits/30")
  }
}
