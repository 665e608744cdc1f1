package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece apply: greedy longest-match-first sub-word
  * segmentation against a vocabulary — the OTHER public tokenizer family
  * next to [[Bpe]]'s merge-rank encoder. The algorithm is the released
  * BERT `WordpieceTokenizer.tokenize` (Devlin et al. 2019, public
  * `tokenization.py`): per word, repeatedly take the LONGEST vocabulary
  * piece matching at the cursor — plain surface at the word start,
  * `##`-prefixed continuation after it — and emit ONE `[UNK]` for the
  * whole word if any position has no match or the word exceeds 100
  * characters.
  *
  * Faithfulness notes, both mirrored by the DuckDB oracle:
  *  - positions/lengths are UNICODE CODE POINTS (DuckDB `len`/`substr`
  *    are code-point based; Java String indexing is not — the walk here
  *    runs over [[Bpe.codePoints]]);
  *  - the published algorithm checks the RAW surface at the word start,
  *    so a word literally beginning with `##` can match a continuation
  *    piece there — the upstream quirk is reproduced, not "fixed",
  *    because the gate demands the two engines agree on one semantics.
  *
  * The vocabulary travels as a foldable string literal (U+0001-joined),
  * parsed once per task into a hash set — the [[Bpe]] merge-table trade.
  */
object WordPiece {

  val FieldSep = '\u0001'
  val Unk = "[UNK]"
  val MaxChars = 100 // the public BERT max_input_chars_per_word

  def parseVocab(blob: String): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](1 << 12)
    if (blob.nonEmpty) blob.split(FieldSep).foreach(s.add)
    s
  }

  def serializeVocab(pieces: Seq[String]): String = {
    pieces.foreach { p =>
      require(!p.exists(_ == FieldSep), "vocab pieces may not contain U+0001")
    }
    pieces.mkString(FieldSep.toString)
  }

  /** Greedy longest-match segmentation of one word (code-point walk). */
  def encodeWord(word: String, vocab: java.util.HashSet[String]): Array[String] = {
    val cps = Bpe.codePoints(word)
    if (cps.length > MaxChars) return Array(Unk)
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var start = 0
    while (start < cps.length) {
      var end = cps.length
      var cur: String = null
      while (cur == null && end > start) {
        val core = cps.slice(start, end).mkString
        val sub = if (start == 0) core else "##" + core
        if (vocab.contains(sub)) cur = sub else end -= 1
      }
      if (cur == null) return Array(Unk)
      out += cur
      start = end
    }
    out.toArray
  }

  private def checkArgs(left: Expression, right: Expression, name: String): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$name expects (string, string vocab blob)")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$name vocab must be a literal")
    else TypeCheckResult.TypeCheckSuccess

  /** `graft_wordpiece_tokens(word, vocab)` — the greedy-match piece array
    * of ONE word (no whitespace splitting).
    */
  case class WpTokens(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = checkArgs(left, right, prettyName)

    @transient private lazy val vocab: java.util.HashSet[String] =
      WordPiece.parseVocab(right.eval().asInstanceOf[UTF8String].toString)

    override protected def nullSafeEval(word: Any, blob: Any): Any = {
      val w = word.asInstanceOf[UTF8String].toString
      new GenericArrayData(
        WordPiece.encodeWord(w, vocab).map(t => UTF8String.fromString(t): Any))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): WpTokens =
      copy(left = l, right = r)
    override def prettyName: String = "graft_wordpiece_tokens"
  }

  /** `graft_wordpiece_len(text, vocab)` — total WordPiece token count of a
    * text column (lower/trim/whitespace words, each word costs
    * |encodeWord|; `[UNK]` counts 1). The [[Bpe.BpeLen]] twin, with the
    * same zipfian word→count memo.
    */
  case class WpLen(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = checkArgs(left, right, prettyName)

    @transient private lazy val vocab: java.util.HashSet[String] =
      WordPiece.parseVocab(right.eval().asInstanceOf[UTF8String].toString)
    @transient private lazy val memo =
      ThreadLocal.withInitial[java.util.HashMap[String, java.lang.Integer]](
        () => new java.util.HashMap[String, java.lang.Integer](1 << 12))
    private val MemoMax = 1 << 16

    override protected def nullSafeEval(text: Any, blob: Any): Any = {
      val words = NativeHash.tokenize(text.asInstanceOf[UTF8String])
      val m = memo.get()
      var total = 0
      var i = 0
      while (i < words.length) {
        val w = words(i)
        if (w.nonEmpty) {
          val hit = m.get(w)
          val n = if (hit != null) hit.intValue()
          else {
            val v = WordPiece.encodeWord(w, vocab).length
            if (m.size >= MemoMax) m.clear()
            m.put(w, v)
            v
          }
          total += n
        }
        i += 1
      }
      total
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): WpLen =
      copy(left = l, right = r)
    override def prettyName: String = "graft_wordpiece_len"
  }
}
