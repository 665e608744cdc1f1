package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unigram-LM apply: Viterbi minimum-cost sub-word segmentation
  * against a vocabulary with per-piece integer costs — the THIRD public
  * tokenizer family, next to [[Bpe]]'s merge-rank encoder and
  * [[WordPiece]]'s greedy matcher. The algorithm is the SentencePiece
  * unigram model's inference step (Kudo 2018): segment each word into
  * the piece sequence minimizing the total cost Σ cost(pieceᵢ) — the
  * integer analogue of maximizing Σ log p(pieceᵢ) — via dynamic
  * programming over word positions. Unlike WordPiece's greedy walk, the
  * DP is GLOBALLY optimal: a locally long match loses to a cheaper
  * two-piece split.
  *
  * Determinism contract (mirrored by the DuckDB oracle):
  *  - costs are INTEGERS pinned in the vocabulary fixture (built by
  *    [[graft.operators.Unigram.buildVocab]] from bit-length lenses —
  *    no floating log-probs to drift);
  *  - ties on total cost resolve to the LONGEST piece at each position
  *    (checked left-to-right), a total order;
  *  - positions/lengths are UNICODE CODE POINTS;
  *  - words over [[WordPiece.MaxChars]] code points collapse to one
  *    `[UNK]`, the same cap as the WordPiece walk.
  */
object Unigram {

  val FieldSep = '\u0001'
  val CostSep = '\u0002'
  val Unk = WordPiece.Unk
  val MaxChars = WordPiece.MaxChars
  val PieceLenMax = 12 // max piece length in code points (= WordPiece core cap)
  val Inf = 1073741823 // 2^30 - 1: "unreachable", safe to add costs onto

  def parseVocab(blob: String): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](1 << 12)
    if (blob.nonEmpty) blob.split(FieldSep).foreach { e =>
      val i = e.lastIndexOf(CostSep)
      m.put(e.substring(0, i), Integer.valueOf(e.substring(i + 1).toInt))
    }
    m
  }

  def serializeVocab(entries: Seq[(String, Int)]): String = {
    entries.foreach { case (p, c) =>
      require(!p.exists(ch => ch == FieldSep || ch == CostSep),
        "vocab pieces may not contain U+0001/U+0002")
      require(c >= 0 && c < Inf, s"cost out of range for '$p': $c")
    }
    entries.map { case (p, c) => s"$p$CostSep$c" }.mkString(FieldSep.toString)
  }

  /** Viterbi minimum-cost segmentation of one word (code-point DP).
    * Returns `[UNK]` for words over [[MaxChars]] code points or (with a
    * gap-ridden vocabulary) words with no segmentation at all — with all
    * single-character pieces mandatory in the vocab, every in-corpus
    * word within the cap is encodable.
    */
  def encodeWord(word: String, vocab: java.util.HashMap[String, Integer]): Array[String] = {
    val cps = Bpe.codePoints(word)
    val n = cps.length
    if (n > MaxChars) return Array(Unk)
    val best = Array.fill(n + 1)(Inf)
    val choice = new Array[Int](n + 1)
    best(n) = 0
    var i = n - 1
    while (i >= 0) {
      val maxL = math.min(PieceLenMax, n - i)
      var l = 1
      while (l <= maxL) {
        if (best(i + l) < Inf) {
          val c = vocab.get(cps.slice(i, i + l).mkString)
          if (c != null) {
            val tot = c.intValue() + best(i + l)
            // strict < keeps the FIRST minimum except we scan l ascending,
            // so >= replacement on equality pins "longest piece wins ties"
            if (tot < best(i) || (tot == best(i) && best(i) < Inf && l > choice(i))) {
              best(i) = tot
              choice(i) = l
            }
          }
        }
        l += 1
      }
      i -= 1
    }
    if (best(0) >= Inf) return Array(Unk)
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var p = 0
    while (p < n) {
      out += cps.slice(p, p + choice(p)).mkString
      p += choice(p)
    }
    out.toArray
  }

  private def checkArgs(left: Expression, right: Expression, name: String): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$name expects (string, string vocab blob)")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$name vocab must be a literal")
    else TypeCheckResult.TypeCheckSuccess

  /** `graft_unigram_tokens(word, vocab)` — the Viterbi min-cost piece
    * array of ONE word (no whitespace splitting).
    */
  case class UgTokens(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = checkArgs(left, right, prettyName)

    @transient private lazy val vocab: java.util.HashMap[String, Integer] =
      Unigram.parseVocab(right.eval().asInstanceOf[UTF8String].toString)

    override protected def nullSafeEval(word: Any, blob: Any): Any = {
      val w = word.asInstanceOf[UTF8String].toString
      new GenericArrayData(
        Unigram.encodeWord(w, vocab).map(t => UTF8String.fromString(t): Any))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): UgTokens =
      copy(left = l, right = r)
    override def prettyName: String = "graft_unigram_tokens"
  }
}
