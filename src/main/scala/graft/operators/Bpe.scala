package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TRAINING as a Spark job, and the column surface over
  * the native apply expression ([[graft.plans.Bpe]]).
  *
  * Why: every token-denominated operator in the library (budget mixing,
  * sequence packing, sharding, chunking) counted whitespace/regex tokens —
  * a systematic drift from model-tokenizer counts (code, CJK, punctuation-
  * heavy text). Training real merges over the corpus and applying them
  * natively closes that gap with the standard public algorithm (Sennrich
  * et al. 2016, the GPT-2/tiktoken family shape).
  *
  * Training plan, sized for 100 TB: BPE training operates on the WORD
  * FREQUENCY table, not the corpus — the classic formulation every public
  * trainer uses. The corpus-sized work (word counting) is one distributed
  * map-side-combined aggregation; the driver then trains on the top
  * `vocabCap` words by (count desc, word) — a BOUNDED TakeOrdered collect
  * (65536 rows ≈ single-digit MB), the same bounded-driver-sample trade as
  * the IVF quantizer. Truncating the tail of the word-frequency table is
  * standard practice and changes merges only when tail mass rivals head
  * mass (not a property of natural-language corpora). Training itself is
  * O(numMerges × vocab × word-length) — seconds for realistic sizes — and
  * fully deterministic: ties in pair frequency break lexicographically, so
  * the merge table is a pure function of the word-frequency table.
  */
object Bpe {

  /** Learn `numMerges` BPE merges from the corpus. Returns the rank-ordered
    * merge table (rank ∈ 1..numMerges, lhs, rhs) — the artifact the apply
    * expression and the DuckDB oracle both consume.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            vocabCap: Int = 65536): DataFrame = {
    require(numMerges > 0 && vocabCap > 0, "numMerges and vocabCap must be positive")
    val spark = docs.sparkSession
    val freq = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w"))
      .limit(vocabCap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val merges = trainOnWordFreq(freq, numMerges)
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "lhs", "rhs")
  }

  /** BYTE-LEVEL training — the real GPT-2/LLaMA tokenizer family shape:
    * words remap through the public byte→unicode table
    * ([[graft.plans.Bpe.byteSymbols]]) and merges are learned over byte
    * symbols. The resulting merge table pairs are SYMBOL strings; encode
    * with [[bpeLenBytes]]/[[bpeTokensBytes]] and id-map with
    * [[vocabBytes]]. Because the 256 byte symbols are the closed base
    * alphabet, no UNK token exists — unseen text falls back to byte
    * tokens, so token counts never drift on non-Latin/code text the way
    * the code-point path's UNK = −1 does.
    *
    * Same 100 TB plan as [[train]]: the corpus-sized work is the one
    * word-count aggregation; the remap is a driver-side pure function of
    * the bounded top-`vocabCap` table.
    */
  def trainBytes(docs: DataFrame, textCol: String, numMerges: Int,
                 vocabCap: Int = 65536): DataFrame = {
    require(numMerges > 0 && vocabCap > 0, "numMerges and vocabCap must be positive")
    val spark = docs.sparkSession
    val freq = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w"))
      .limit(vocabCap)
      .collect()
      // byteSymbols is injective, so distinct words stay distinct rows
      .map(r => (graft.plans.Bpe.byteSymbols(r.getString(0)), r.getLong(1)))
    val merges = trainOnWordFreq(freq, numMerges)
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }
      .toDF("rank", "lhs", "rhs")
  }

  /** The classic in-memory trainer over a word-frequency table: repeatedly
    * count adjacent token pairs (weighted by word frequency), merge the
    * most frequent pair everywhere, stop early when no pair repeats.
    * Deterministic: ties break by (lhs, rhs) lexicographic order.
    */
  private[operators] def trainOnWordFreq(freq: Seq[(String, Long)],
                                         numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      freq.map { case (w, f) => (graft.plans.Bpe.codePoints(w), f) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rank = 0
    while (rank < numMerges) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      words.foreach { case (toks, f) =>
        var i = 0
        while (i < toks.length - 1) {
          val p = (toks(i), toks(i + 1))
          val c = counts.get(p)
          counts.put(p, if (c == null) f else c.longValue() + f)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestC = 1L // require count >= 2: a pair seen once is noise, stop there
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue.longValue()
        if (c > bestC || (c == bestC && best != null && ordLt(e.getKey, best))) {
          best = e.getKey
          bestC = c
        }
      }
      if (best == null) rank = numMerges
      else {
        merges += best
        words = words.map { case (toks, f) => (applyOnce(toks, best._1, best._2), f) }
        rank += 1
      }
    }
    merges.toSeq
  }

  private def ordLt(a: (String, String), b: (String, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def applyOnce(toks: Array[String], lhs: String, rhs: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == lhs && toks(i + 1) == rhs) {
        out += lhs + rhs
        i += 2
      } else {
        out += toks(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Deterministic token VOCABULARY for a trained merge table — the id
    * space a packed corpus stores: base tokens are the distinct code
    * points of the top-`vocabCap` training words (sorted, ids 0..B−1);
    * merged tokens follow in rank order (ids B, B+1, …). Two different
    * merge chains can in principle produce the same SURFACE string
    * ((a, bc) and (ab, c) both yield "abc"); the vocabulary keys by
    * surface string and keeps the lowest id, so encode→id is a function.
    * Tokens outside the vocabulary (code points beyond the training top
    * words) map to −1 (UNK) at encode time.
    */
  def vocab(docs: DataFrame, textCol: String, mergeTable: DataFrame,
            vocabCap: Int = 65536): DataFrame = {
    val spark = docs.sparkSession
    val topWords = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w"))
      .limit(vocabCap)
      .collect().map(_.getString(0))
    val base = topWords.flatMap(graft.plans.Bpe.codePoints).distinct.sorted
    val merged = mergesOf(mergeTable).map { case (l, r) => l + r }
    val all = (base ++ merged).zipWithIndex
      .groupBy(_._1).map { case (t, ids) => (t, ids.map(_._2).min) }
      .toSeq.sortBy(_._2)
    import spark.implicits._
    all.map { case (t, i) => (i, t) }.toDF("token_id", "token")
  }

  /** BYTE-LEVEL vocabulary: ids 0..255 are the 256 byte symbols in BYTE
    * order (the GPT-2 layout — corpus-independent, every possible input
    * byte is covered), merged tokens follow in rank order from id 256.
    * Surface-string dedup keeps the lowest id, same rule as [[vocab]].
    * With this id space [[bpeTokensBytes]] output ALWAYS resolves — the
    * zero-UNK property `q_bpe_encode_bytes` pins under the oracle.
    */
  def vocabBytes(spark: org.apache.spark.sql.SparkSession,
                 mergeTable: DataFrame): DataFrame = {
    val base = (0 until 256).map(b => graft.plans.Bpe.byteSymbolTable(b).toString)
    val merged = mergesOf(mergeTable).map { case (l, r) => l + r }
    val all = (base ++ merged).zipWithIndex
      .groupBy(_._1).map { case (t, ids) => (t, ids.map(_._2).min) }
      .toSeq.sortBy(_._2)
    import spark.implicits._
    all.map { case (t, i) => (i, t) }.toDF("token_id", "token")
  }

  /** Merge table → the rank-ordered pair list the apply expression takes.
    * Bounded collect: the table is ≤ numMerges rows by construction.
    */
  def mergesOf(mergeTable: DataFrame): Seq[(String, String)] =
    mergeTable.select("rank", "lhs", "rhs").collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Total BPE token count of a text column under a trained merge list —
    * the model-token replacement for [[TextFunctions.tokenCountWs]].
    */
  def bpeLen(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_len", text,
      lit(graft.plans.Bpe.serializeMerges(merges)))

  /** Encoded token array of a single word (inspection/spec surface). */
  def bpeTokens(word: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_tokens", word,
      lit(graft.plans.Bpe.serializeMerges(merges)))

  /** Byte-level token count — [[bpeLen]] over [[trainBytes]] merges;
    * UNK-free on any input, so budgets/packing/shards built on it match
    * what a real byte-level model tokenizer would count.
    */
  def bpeLenBytes(text: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_len_bytes", text,
      lit(graft.plans.Bpe.serializeMerges(merges)))

  /** Byte-level encoded token array of a single word. */
  def bpeTokensBytes(word: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_tokens_bytes", word,
      lit(graft.plans.Bpe.serializeMerges(merges)))
}
