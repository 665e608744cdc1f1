package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native byte-pair-encoding apply: encode words against a TRAINED merge
  * table (learned by [[graft.operators.Bpe.train]]) instead of the
  * whitespace/regex token approximations in TextFunctions — token budgets,
  * packing and chunking drift materially from model-tokenizer counts on
  * code and CJK text without this.
  *
  * Apply semantics (the public BPE algorithm of Sennrich et al. 2016 /
  * the GPT-2 tokenizer): start from the word's Unicode code points and
  * repeatedly merge the present pair with the LOWEST merge rank until no
  * learned pair remains. Implemented here as one exhaustive left-to-right
  * pass per merge rank in rank order — provably equivalent to the
  * lowest-rank-first loop, because a merge learned at rank k builds only
  * on tokens that existed before rank k: applying rank k can create new
  * pairs only of the form (u, lhs·rhs) or (lhs·rhs, v), and any learned
  * pair containing the rank-k token must itself have rank > k. The same
  * rank-order formulation is what the DuckDB oracle replays (one literal
  * `replace` per rank over a separator-wrapped token string), so the
  * entire tokenization sits under the hash gate.
  *
  * The merge table travels as a foldable string literal (rank-ordered
  * entries, US/RS control separators) — a few KB resolved once per task,
  * never a join; per-thread word→count memoization makes repeated words
  * (zipfian, most of any corpus) near-free, the same trade as the md5
  * memo in [[NativeHash]].
  */
object Bpe {

  /** entry separator / field separator for the serialized merge table */
  val EntrySep = '\u0002'
  val FieldSep = '\u0001'

  def parseMerges(blob: String): Array[(String, String)] =
    if (blob.isEmpty) Array.empty
    else blob.split(EntrySep).map { e =>
      val i = e.indexOf(FieldSep)
      require(i >= 0, s"malformed merge entry '$e'")
      (e.substring(0, i), e.substring(i + 1))
    }

  def serializeMerges(merges: Seq[(String, String)]): String = {
    merges.foreach { case (l, r) =>
      require(!l.exists(c => c == EntrySep || c == FieldSep) &&
              !r.exists(c => c == EntrySep || c == FieldSep),
        "merge tokens may not contain U+0001/U+0002")
    }
    merges.map { case (l, r) => s"$l$FieldSep$r" }.mkString(EntrySep.toString)
  }

  /** The public GPT-2 byte→unicode table (`bytes_to_unicode` in the
    * released gpt-2 `encoder.py`; same table in every byte-level BPE
    * tokenizer since): printable bytes 33–126, 161–172, 174–255 map to
    * themselves as code points; the 68 remaining bytes (0–32, 127–160,
    * 173) map to 256+rank in byte order — so byte 32 (space) is U+0120
    * 'Ġ' and byte 10 (newline) is U+010A 'Ċ', the famous GPT-2 marker
    * characters. A bijection byte ↔ one BMP char: symbol strings are
    * ordinary strings, [[codePoints]] of a symbol string = the symbols.
    */
  val byteSymbolTable: Array[Char] = Array.tabulate(256) { b =>
    if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)) b.toChar
    else if (b <= 32) (256 + b).toChar
    else if (b <= 160) (256 + 33 + (b - 127)).toChar
    else (256 + 67).toChar // b == 173
  }

  /** A word's UTF-8 bytes rendered as the byte-symbol string BYTE-LEVEL
    * BPE trains and encodes over. Injective (the table is a bijection per
    * byte and UTF-8 is prefix-free), so distinct words stay distinct.
    */
  def byteSymbols(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteSymbolTable(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  def codePoints(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** One exhaustive leftmost-first, non-overlapping application of a single
    * merge — exactly DuckDB `replace` over the separator-wrapped form.
    */
  private def applyMerge(toks: Array[String], lhs: String, rhs: String): Array[String] = {
    var hit = false
    var i = 0
    while (!hit && i < toks.length - 1) {
      if (toks(i) == lhs && toks(i + 1) == rhs) hit = true
      i += 1
    }
    if (!hit) return toks
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    i = 0
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

  def encodeWord(word: String, merges: Array[(String, String)]): Array[String] = {
    var toks = codePoints(word)
    var r = 0
    while (r < merges.length && toks.length >= 2) {
      toks = applyMerge(toks, merges(r)._1, merges(r)._2)
      r += 1
    }
    toks
  }

  /** BYTE-LEVEL encode: the word remaps to its byte-symbol string first,
    * then the same rank-order merge application runs over the symbols.
    * Every emitted token is a single byte symbol (always in the 256-entry
    * base vocabulary) or a learned merge's surface — no UNK can exist,
    * the property the real GPT-2/LLaMA tokenizer family has and the
    * code-point path lacks (unseen code points there map to −1).
    */
  def encodeWordBytes(word: String, merges: Array[(String, String)]): Array[String] =
    encodeWord(byteSymbols(word), merges)

  private def checkArgs(left: Expression, right: Expression, name: String): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$name expects (string, string merge blob)")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$name merge table must be a literal")
    else TypeCheckResult.TypeCheckSuccess

  /** `graft_bpe_len(text, merges)` — total BPE token count of `text`:
    * lower/trim/whitespace-split (the library's shared word tokenizer),
    * empty words contribute nothing, each word costs |encodeWord(word)|.
    * The per-document cost of a training corpus in MODEL tokens — the
    * column token budgets / packing / shards consume.
    */
  case class BpeLen(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = checkArgs(left, right, prettyName)

    @transient private lazy val merges: Array[(String, String)] =
      Bpe.parseMerges(right.eval().asInstanceOf[UTF8String].toString)
    // word vocabularies are zipfian: memoize word→len per thread, bounded
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
            val v = Bpe.encodeWord(w, merges).length
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
    override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeLen =
      copy(left = l, right = r)
    override def prettyName: String = "graft_bpe_len"
  }

  /** `graft_bpe_len_bytes(text, merges)` — [[BpeLen]] over the BYTE-LEVEL
    * encode: each word remaps through the public byte→unicode table before
    * the merges apply, so the count is in real byte-level model tokens
    * (never UNK-distorted on code/CJK/emoji text).
    */
  case class BpeLenBytes(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = checkArgs(left, right, prettyName)

    @transient private lazy val merges: Array[(String, String)] =
      Bpe.parseMerges(right.eval().asInstanceOf[UTF8String].toString)
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
            val v = Bpe.encodeWordBytes(w, merges).length
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
    override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeLenBytes =
      copy(left = l, right = r)
    override def prettyName: String = "graft_bpe_len_bytes"
  }

  /** `graft_bpe_tokens_bytes(word, merges)` — byte-level twin of
    * [[BpeTokens]]: the encoded SYMBOL-string token array of one word.
    */
  case class BpeTokensBytes(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = checkArgs(left, right, prettyName)

    @transient private lazy val merges: Array[(String, String)] =
      Bpe.parseMerges(right.eval().asInstanceOf[UTF8String].toString)

    override protected def nullSafeEval(word: Any, blob: Any): Any = {
      val w = word.asInstanceOf[UTF8String].toString
      new GenericArrayData(
        Bpe.encodeWordBytes(w, merges).map(t => UTF8String.fromString(t): Any))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeTokensBytes =
      copy(left = l, right = r)
    override def prettyName: String = "graft_bpe_tokens_bytes"
  }

  /** `graft_bpe_tokens(word, merges)` — the encoded token array of ONE
    * word (no whitespace splitting): the inspection/debug surface and the
    * spec's hand-check hook.
    */
  case class BpeTokens(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = checkArgs(left, right, prettyName)

    @transient private lazy val merges: Array[(String, String)] =
      Bpe.parseMerges(right.eval().asInstanceOf[UTF8String].toString)

    override protected def nullSafeEval(word: Any, blob: Any): Any = {
      val w = word.asInstanceOf[UTF8String].toString
      new GenericArrayData(
        Bpe.encodeWord(w, merges).map(t => UTF8String.fromString(t): Any))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeTokens =
      copy(left = l, right = r)
    override def prettyName: String = "graft_bpe_tokens"
  }
}
