package graft

import graft.operators.{Unigram => UgOp}
import graft.plans.{Unigram => Ug}
import org.apache.spark.sql.functions._

/** Unigram-LM Viterbi tokenizer: minimum-total-cost segmentation on hand
  * fixtures (global optimality beats greedy, longest-piece tie-break,
  * [UNK] semantics), vocabulary construction invariants (mandatory
  * single chars, the bit-length cost lens), and native expression ≡
  * Scala model ≡ brute-force DP parity on the real corpus.
  */
class UnigramSpec extends SparkSpec {

  private def vocabOf(ps: (String, Int)*): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    ps.foreach { case (p, c) => m.put(p, Integer.valueOf(c)) }
    m
  }

  test("Viterbi beats greedy: a long expensive piece loses to a cheaper split") {
    val v = vocabOf("abc" -> 9, "a" -> 1, "bc" -> 1, "ab" -> 5, "c" -> 5)
    // greedy longest-match would emit [abc] (cost 9); the DP finds a+bc = 2
    assert(Ug.encodeWord("abc", v).toSeq == Seq("a", "bc"))
    // single piece when it IS the cheapest
    assert(Ug.encodeWord("abc", vocabOf("abc" -> 1, "a" -> 1, "bc" -> 1)).toSeq == Seq("abc"))
  }

  test("ties on total cost take the longest piece at each position") {
    // ab(2) vs a(1)+b(1)=2 — tie, longest wins
    assert(Ug.encodeWord("ab", vocabOf("ab" -> 2, "a" -> 1, "b" -> 1)).toSeq == Seq("ab"))
    // the tie-break applies per position on the optimal path: abab with
    // ab=2,a=1,b=1: every split costs 4; longest-first at each step → ab,ab
    assert(Ug.encodeWord("abab", vocabOf("ab" -> 2, "a" -> 1, "b" -> 1)).toSeq == Seq("ab", "ab"))
  }

  test("[UNK]: uncovered position or over-cap words collapse whole word") {
    val v = vocabOf("a" -> 1, "b" -> 1)
    assert(Ug.encodeWord("axb", v).toSeq == Seq(Ug.Unk))
    assert(Ug.encodeWord("a" * 101, v).toSeq == Seq(Ug.Unk))
    assert(Ug.encodeWord("a" * 100, v).length == 100)
  }

  test("vocabulary invariants: mandatory single chars, bit-length cost lens, [UNK] at 0") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = UgOp.buildVocab(docs, "text", vocabSize = 512).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val byPiece = vocab.map(v => v._1 -> v).toMap
    assert(byPiece(Ug.Unk)._2 == 0 && byPiece(Ug.Unk)._4 == 0)
    assert(vocab.map(_._2).sorted.toSeq == vocab.indices.toSeq, "dense ids")
    // every in-corpus single char must be present (encodability guarantee)
    val chars = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= Ug.MaxChars)
      .select(explode(split(col("w"), "")).as("c")).filter(length(col("c")) === 1)
      .distinct().collect().map(_.getString(0))
      .filter(c => c != Ug.FieldSep.toString && c != Ug.CostSep.toString)
    chars.foreach(c => assert(byPiece.contains(c), s"single char '$c' missing"))
    // cost = bitlen(total) - bitlen(score) + 1 over the kept non-UNK mass
    val total = vocab.filter(_._2 > 0).map(_._3).sum
    def bitlen(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    vocab.filter(_._2 > 0).foreach { case (p, _, score, cost) =>
      assert(cost == bitlen(total) - bitlen(score) + 1, s"cost lens drift on '$p'")
      assert(cost >= 1)
    }
  }

  test("native expression ≡ Scala model ≡ brute-force DP on real corpus words") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocabDf = UgOp.buildVocab(docs, "text", vocabSize = 512)
    val entries = UgOp.entriesOf(vocabDf)
    val vm = vocabOf(entries: _*)
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(500)
    val got = words.select(col("w"), UgOp.ugTokens(col("w"), entries).as("t"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    // brute-force reference: plain memoized recursion, no rolling window
    def brute(w: String): (Int, List[String]) = {
      val cps = w.codePoints.toArray
      val memo = new scala.collection.mutable.HashMap[Int, (Int, List[String])]
      def go(i: Int): (Int, List[String]) = {
        if (i == cps.length) return (0, Nil)
        memo.getOrElseUpdate(i, {
          var bc = Ug.Inf; var bs: List[String] = null; var bl = 0
          (1 to math.min(Ug.PieceLenMax, cps.length - i)).foreach { l =>
            val p = new String(cps, i, l)
            val c = vm.get(p)
            if (c != null) {
              val (rc, rs) = go(i + l)
              if (rc < Ug.Inf && (c + rc < bc || (c + rc == bc && l > bl))) {
                bc = c + rc; bs = p :: rs; bl = l
              }
            }
          }
          (bc, bs)
        })
      }
      go(0)
    }
    got.foreach { case (w, t) =>
      assert(t == Ug.encodeWord(w, vm).toSeq, s"native/model parity drift on '$w'")
      val (bc, bs) = brute(w)
      if (w.codePointCount(0, w.length) <= Ug.MaxChars && bc < Ug.Inf)
        assert(t == bs, s"DP drift vs brute force on '$w': $t vs $bs")
    }
  }
}
