package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INT8 embedding quantization — the production memory trick for a 100 TB
  * embedding store (the scalar-quantization half of the PQ/SQ family every
  * vector database ships): per-dimension affine codes cut the store 4×
  * (1 byte vs 4 per element) and turn similarity scans into integer
  * arithmetic, at a bounded reconstruction error the spec pins.
  *
  * EXACT-REPLAY CONTRACT (the repo posture): the per-dimension (min, max)
  * ranges come from one map-side-combined aggregation; the code is
  * `round((x − mn) · (254 / (mx − mn))) − 127 ∈ [−127, 127]` — every op
  * (subtract, divide-once-per-dim, multiply, round-half-up on a
  * non-negative value) is IEEE-exactly-rounded and written in the same
  * association on both engines, so codes — and everything computed from
  * them — are bit-identical cross-engine and partitioning-independent.
  * Constant dimensions (mx = mn) code to 0. Quantized similarity is a
  * pure INTEGER dot product (≤ dim · 127² — fits int at any realistic
  * dim), so ranking needs no float at all.
  *
  * Scale shape: range extraction is ONE slim aggregation to dim rows
  * (control plane, collected like [[Pca]]'s mean); encoding is a DOC-LOCAL
  * `transform` against literal range arrays — zero joins, zero shuffle,
  * stays in the scan stage; the quantized ANN mirrors [[Ann.topK]]'s
  * broadcast × stream shape with the 4×-smaller code arrays riding the
  * broadcast.
  */
object Quant {

  /** Per-dimension (mn, mx) of the corpus as driver arrays — dim doubles,
    * control-plane sized. Floats widen to double exactly, so min/max are
    * the same bits any engine computes.
    */
  def dimRanges(vecs: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = vecs.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .collect()
    require(rows.nonEmpty, "quantize: empty input")
    val dim = rows.map(_.getInt(0)).max + 1
    val mn = new Array[Double](dim)
    val mx = new Array[Double](dim)
    rows.foreach { r => mn(r.getInt(0)) = r.getDouble(1); mx(r.getInt(0)) = r.getDouble(2) }
    (mn, mx)
  }

  /** Doc-local int8 code array against literal ranges: element i codes to
    * `round((x − mn_i) · (254 / (mx_i − mn_i))) − 127`, constant dims to 0.
    */
  def codes(vecCol: Column, mn: Array[Double], mx: Array[Double]): Column = {
    val mnL = typedLit(mn.toSeq)
    val mxL = typedLit(mx.toSeq)
    transform(vecCol, (x, i) => {
      val lo = element_at(mnL, i + 1)
      val hi = element_at(mxL, i + 1)
      when(hi === lo, lit(0).cast("tinyint"))
        .otherwise((round((x.cast("double") - lo) * (lit(254.0) / (hi - lo))) - 127)
          .cast("tinyint"))
    })
  }

  /** (idCol, pos, code) — the quantized store, exploded (1 byte of payload
    * per cell where the float store pays 4).
    */
  def quantized(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (mn, mx) = dimRanges(vecs, vecCol)
    vecs.select(col(idCol), posexplode(codes(col(vecCol), mn, mx)).as(Seq("pos", "code")))
  }

  /** Exact integer dot product of two code arrays — ≤ dim · 127², no
    * overflow at any realistic dim; strictly left-to-right like every
    * vector fold in the repo.
    */
  def dotCodes(a: Column, b: Column): Column =
    graft.plans.NativeHash.dotCodes(a, b) // native one-loop (r12); spec-pinned vs the fold

  private[graft] def dotCodesDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("int") * y.cast("int")),
      lit(0), (acc, v) => acc + v)

  /** Per-dimension reconstruction-error report of the int8 store — the
    * quality audit that decides whether the 4× memory trade is safe for a
    * given corpus: for every dimension, the count, max, sum, and mean of
    * |original − dequantized| in MICRO-UNITS. Errors are exact integers
    * (both sides round to micro-units before differencing — the
    * [[KMeans.quantize]] recipe), so the whole report is
    * partitioning-independent; the mean is ONE pinned double division.
    * One doc-local projection + one map-side-combined agg to dim rows.
    */
  def quantErrorByDim(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (mn, mx) = dimRanges(vecs, vecCol)
    val step = mn.indices.map(i => (mx(i) - mn(i)) / 254.0).toArray
    val mnL = typedLit(mn.toSeq)
    val stepL = typedLit(step.toSeq)
    vecs.select(col(idCol),
        posexplode(transform(codes(col(vecCol), mn, mx), (c, i) => {
          val deq = element_at(mnL, i + 1) +
            (c.cast("double") + lit(127.0)) * element_at(stepL, i + 1)
          abs(round(element_at(col(vecCol), i + 1).cast("double") * lit(1000000.0)) -
            round(deq * lit(1000000.0))).cast("long")
        })).as(Seq("pos", "err_u")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), max("err_u").as("max_err_u"), sum("err_u").as("sum_err_u"))
      .select(col("pos"), col("n"), col("max_err_u"), col("sum_err_u"),
        (col("sum_err_u").cast("double") / col("n")).as("mean_err_u"))
  }

  /** Per-dimension midrange thresholds, (mn+mx)/2: both addends are exact
    * corpus statistics and the two IEEE ops (add, halve) are exactly
    * deterministic, so every engine computes the same threshold bits.
    */
  def midranges(vecs: DataFrame, vecCol: String): Array[Double] = {
    val (mn, mx) = dimRanges(vecs, vecCol)
    mn.indices.map(i => (mn(i) + mx(i)) / 2.0).toArray
  }

  /** 1-bit sign codes (the third rung of the quantization ladder: fp32 →
    * int8 → PQ bytes → 1 bit/dim), packed 32 dims per word by a left fold
    * `acc·2 + bit` over ascending positions — the SQL-replayable packing,
    * and 32 keeps the fold's intermediate `acc·2` far from Long overflow.
    * Bit = (x > midrange); a constant dimension codes to 0.
    * Returns an array of ceil(dim/32) longs — at dim 64, TWO words where
    * the float store pays 256 bytes.
    */
  def signWords(vecCol: Column, mid: Array[Double]): Column = {
    val nWords = (mid.length + 31) / 32
    array((0 until nWords).map { w =>
      val lo = w * 32
      val len = math.min(32, mid.length - lo)
      aggregate(zip_with(slice(vecCol, lo + 1, len), typedLit(mid.slice(lo, lo + len).toSeq),
        (x, t) => when(x.cast("double") > t, lit(1L)).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc * lit(2L) + b)
    }: _*)
  }

  /** The binarized store, exploded to (idCol, widx, word) scalar cells. */
  def binarized(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val mid = midranges(vecs, vecCol)
    vecs.select(col(idCol), posexplode(signWords(col(vecCol), mid)).as(Seq("widx", "word")))
  }

  /** Exact Hamming distance between two packed-word arrays: popcount of
    * the per-word XOR, summed — pure integer, codegen-friendly.
    */
  def hammingDist(a: Column, b: Column): Column =
    graft.plans.NativeHash.hammingWords(a, b) // native one-loop (r12); spec-pinned vs the fold

  private[graft] def hammingDistDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))), lit(0), (acc, v) => acc + v)

  /** Top-k neighbors per query by Hamming distance over the 1-bit store
    * (ascending, neighbor-id tie-break) — the cheapest scan in the family:
    * two longs per candidate at dim 64, XOR+popcount per comparison.
    * Returns (query_id, neighbor_id, hamming, rank).
    */
  def annTopKHamming(queries: DataFrame, vecs: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val mid = midranges(vecs, vecCol)
    val q = queries.select(col(idCol).as("query_id"), signWords(col(vecCol), mid).as("qw"))
    val c = vecs.select(col(idCol).as("neighbor_id"), signWords(col(vecCol), mid).as("cw"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), hammingDist(col("qw"), col("cw")).as("hamming"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("hamming"), col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Two-stage prefix-dimension ANN (the Matryoshka-retrieval pattern —
    * truncate DIMENSIONS for the cheap stage the way the rest of this file
    * truncates PRECISION): stage 1 shortlists `c` candidates per query by
    * the integer micro-unit dot product over only the first `prefixDim`
    * dims; stage 2 reranks the shortlist by the exact full-dim integer dot
    * and keeps `k`. Returns (query_id, neighbor_id, dot_full, rank).
    *
    * Scale shape: the stage-1 scan reads prefixDim/dim of each vector's
    * bytes (a column-pruned store keeps prefixes in their own parquet
    * column at 100 TB); the full-width read and dot happen only on the
    * |Q|·c shortlist. Both stages rank with neighbor-id ties — exact
    * integers, so the whole cascade replays in SQL. Ranking fidelity vs
    * the full dot is the documented truncation trade, measured in
    * QuantSpec on planted structure.
    */
  def annTopKPrefix(queries: DataFrame, vecs: DataFrame, idCol: String, vecCol: String,
                    prefixDim: Int, c: Int, k: Int): DataFrame = {
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    require(c >= k && k >= 1, s"need c >= k >= 1, got c=$c k=$k")
    import org.apache.spark.sql.expressions.Window
    def idot(a: Column, b: Column): Column = graft.plans.NativeHash.dotLL(a, b)
    val q = queries.select(col(idCol).as("query_id"), KMeans.quantize(col(vecCol)).as("qqv"))
    val cand = vecs.select(col(idCol).as("neighbor_id"), KMeans.quantize(col(vecCol)).as("cqv"))
    val shortlist = cand.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("pdot", idot(slice(col("qqv"), 1, prefixDim), slice(col("cqv"), 1, prefixDim)))
      .withColumn("prank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("pdot").desc, col("neighbor_id"))))
      .filter(col("prank") <= c)
    shortlist
      .select(col("query_id"), col("neighbor_id"), idot(col("qqv"), col("cqv")).as("dot_full"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dot_full").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Top-k neighbors per query by QUANTIZED similarity: rank on the
    * integer code dot product (descending, neighbor-id tie-break) — the
    * scan a code-only store can run without touching a single float.
    * Returns (query_id, neighbor_id, dotq, rank). The broadcast side
    * carries 1-byte cells; the stream side encodes in its own scan stage.
    * Ranking fidelity vs float cosine is the documented scalar-quant
    * trade, measured in QuantSpec on planted structure.
    */
  def annTopKQuantized(queries: DataFrame, vecs: DataFrame, idCol: String, vecCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (mn, mx) = dimRanges(vecs, vecCol)
    val q = queries.select(col(idCol).as("query_id"), codes(col(vecCol), mn, mx).as("qc"))
    val c = vecs.select(col(idCol).as("neighbor_id"), codes(col(vecCol), mn, mx).as("cc"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), dotCodes(col("qc"), col("cc")).as("dotq"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dotq").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }
}
