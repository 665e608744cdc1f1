package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE training determinism, apply correctness (including the rank-order /
  * lowest-rank-first equivalence the oracle replay relies on), and the
  * column surface.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training learns the expected merges on a hand-checked corpus") {
    // "low low low lower lowest": chars l o w (+er/est tails)
    // pair counts round 1 (word-freq weighted): (l,o)=5, (o,w)=5, (w,e)=2...
    // tie (l,o) vs (o,w) at 5 → lexicographic: (l,o) first
    val docs = Seq("low low low", "lower lowest").toDF("text")
    val merges = Bpe.mergesOf(Bpe.train(docs, "text", numMerges = 3))
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "s")) ||
           merges.take(2) == Seq(("l", "o"), ("lo", "w")),
      s"got $merges")
    // after (l,o): (lo,w)=5 dominates; after (lo,w): remaining pairs
    // (low,e)=2, (e,r)=1, (e,s)=1, (s,t)=1 → (low,e)
    assert(merges(2) == ("low", "e") || merges(2) == ("e", "s"), s"got $merges")
  }

  test("training is deterministic and a pure function of the word-frequency table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Bpe.mergesOf(Bpe.train(docs, "text", numMerges = 32))
    val b = Bpe.mergesOf(Bpe.train(docs.repartition(13), "text", numMerges = 32))
    assert(a == b && a.length == 32)
  }

  test("encode applies merges leftmost-first, non-overlapping (the replace semantics)") {
    val merges = Seq(("a", "a"))
    val enc = graft.plans.Bpe.encodeWord("aaaa", merges.map(identity).toArray)
    assert(enc.toSeq == Seq("aa", "aa"))
    val odd = graft.plans.Bpe.encodeWord("aaa", merges.toArray)
    assert(odd.toSeq == Seq("aa", "a"))
  }

  test("rank-order exhaustive application == lowest-rank-first greedy (the oracle equivalence)") {
    // reference: the textbook algorithm — repeatedly merge the present
    // pair with the lowest rank, leftmost occurrence first
    def reference(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val rank = merges.zipWithIndex.toMap
      var toks = graft.plans.Bpe.codePoints(word).toSeq
      var done = false
      while (!done && toks.length >= 2) {
        val present = toks.zip(toks.tail).filter(rank.contains)
        if (present.isEmpty) done = true
        else {
          val best = present.minBy(rank)
          val i = toks.zip(toks.tail).indexOf(best)
          toks = toks.take(i) ++ Seq(best._1 + best._2) ++ toks.drop(i + 2)
        }
      }
      toks
    }
    // merges trained on real corpus words → realistic chaining structure
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = Bpe.mergesOf(Bpe.train(docs, "text", numMerges = 48))
    val words = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(500).as[String].collect()
    words.foreach { w =>
      val fast = graft.plans.Bpe.encodeWord(w, merges.toArray).toSeq
      assert(fast == reference(w, merges), s"mismatch on '$w'")
    }
  }

  test("bpeLen: per-document counts are partition-invariant and <= code-point count") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val merges = Bpe.mergesOf(Bpe.train(docs, "text", numMerges = 32))
    val once = docs.select(col("doc_id"), Bpe.bpeLen(col("text"), merges).as("n"))
      .orderBy("doc_id").collect().toSeq
    val wide = docs.repartition(11)
      .select(col("doc_id"), Bpe.bpeLen(col("text"), merges).as("n"))
      .orderBy("doc_id").collect().toSeq
    assert(once == wide)
    // merges only ever shrink the token stream
    val over = docs.select(Bpe.bpeLen(col("text"), merges).as("n"),
        length(regexp_replace(lower(trim(col("text"))), "\\s+", "")).as("chars"))
      .filter(col("n") > col("chars")).count()
    assert(over == 0L)
  }

  test("token ids: vocab is deterministic, encode roundtrips, unseen code points are UNK") {
    val docs = Seq("abc abc cab", "bca").toDF("text")
    val mergeTable = Bpe.train(docs, "text", numMerges = 2)
    val v = Bpe.vocab(docs, "text", mergeTable)
      .collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    // base = sorted distinct code points a,b,c (ids 0..2); merges follow
    assert(v("a") == 0 && v("b") == 1 && v("c") == 2)
    assert(Bpe.mergesOf(mergeTable).map { case (l, r) => l + r }.forall(v.contains))
    // roundtrip: concatenating a word's encoded tokens reproduces the word
    val merges = Bpe.mergesOf(mergeTable)
    for (w <- Seq("abc", "cab", "bca", "abcabc", "zzz"))
      assert(graft.plans.Bpe.encodeWord(w, merges.toArray).mkString == w)
    // a code point absent from training is not in the vocab → UNK id -1
    assert(!v.contains("z"))
  }

  test("spaceless scripts: CJK text tokenizes by learned merges, not whitespace") {
    // whitespace counting sees ONE token per CJK sentence — the drift BPE
    // exists to fix. Merges learned from a tiny CJK corpus compress the
    // frequent bigram; unseen characters stay as single code points.
    val docs = Seq("東京東京東京", "東京の天気", "東京東京").toDF("text")
    val merges = Bpe.mergesOf(Bpe.train(docs, "text", numMerges = 2))
    assert(merges.head == ("東", "京"), s"got $merges") // freq 6, dominates
    val enc = graft.plans.Bpe.encodeWord("東京の天気", merges.toArray).toSeq
    assert(enc.head == "東京" && enc.contains("の"), s"got $enc")
    val counts = docs.select(
        graft.functions.TextFunctions.tokenCountWs(col("text")).as("ws"),
        Bpe.bpeLen(col("text"), merges).as("bpe"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // ws sees 1 token per doc; BPE sees the real granularity:
    // 東京東京東京 → [東京東京, 東京] = 2; 東京の天気 → [東京,の,天,気] = 4;
    // 東京東京 → [東京東京] = 1
    assert(counts.map(_._1) == Seq(1, 1, 1))
    assert(counts.map(_._2) == Seq(2, 4, 1), s"got $counts")
  }

  test("unicode words encode by code point, and empty/whitespace text counts zero") {
    val merges = Seq(("é", "t"), ("ét", "é"))
    assert(graft.plans.Bpe.encodeWord("été", merges.toArray).toSeq == Seq("été"))
    val df = Seq("", "   ", "été été").toDF("text")
    val got = df.select(Bpe.bpeLen(col("text"), merges).as("n")).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 2))
  }

  test("byte symbols: the public GPT-2 table anchors, bijection, UTF-8 expansion") {
    import graft.plans.{Bpe => P}
    // public anchor points: space is 'Ġ' (U+0120), newline 'Ċ' (U+010A),
    // printables map to themselves, byte 173 is the last remapped (U+0143)
    assert(P.byteSymbolTable(32) == 'Ġ' && P.byteSymbolTable(10) == 'Ċ')
    assert(P.byteSymbolTable('a'.toInt) == 'a' && P.byteSymbolTable(126) == '~')
    assert(P.byteSymbolTable(173) == (256 + 67).toChar)
    assert(P.byteSymbolTable.distinct.length == 256) // bijection
    // multi-byte UTF-8 expands: é = 2 bytes, 東 = 3 bytes, 🙂 = 4 bytes
    assert(P.byteSymbols("abc") == "abc")
    assert(P.byteSymbols("é").length == 2 && P.byteSymbols("東").length == 3)
    assert(P.byteSymbols(new String(Character.toChars(0x1F642))).length == 4)
    // injective across distinct words
    val ws = Seq("a", "é", "東", "ab", "a b".replace(" ", ""), "ba")
    assert(ws.map(P.byteSymbols).distinct.length == ws.distinct.length)
  }

  test("byte-level encode: zero UNK on unseen scripts where the code-point path drifts") {
    // train BOTH paths on a Latin-only corpus, then encode CJK text the
    // training never saw — the exact drift case the byte fallback fixes
    val docs = Seq("the quick fox", "the lazy dog", "the the the").toDF("text")
    val cpMerges = Bpe.mergesOf(Bpe.train(docs, "text", numMerges = 8))
    val byMerges = Bpe.mergesOf(Bpe.trainBytes(docs, "text", numMerges = 8))
    val cpVocab = Bpe.vocab(docs, "text", Bpe.train(docs, "text", numMerges = 8))
      .collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    val byVocab = Bpe.vocabBytes(spark, Bpe.trainBytes(docs, "text", numMerges = 8))
      .collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    val unseen = "東京タワー züri 🙂"
    for (w <- unseen.split(" ")) {
      // code-point path: every unseen char is out-of-vocab → UNK
      val cp = graft.plans.Bpe.encodeWord(w, cpMerges.toArray)
      assert(cp.exists(t => !cpVocab.contains(t)), s"expected UNK drift on $w")
      // byte path: every token resolves (base 256 covers all bytes)
      val by = graft.plans.Bpe.encodeWordBytes(w, byMerges.toArray)
      assert(by.forall(byVocab.contains), s"UNK leaked on $w: ${by.toSeq}")
      // and the tokens reassemble the word's symbol string exactly
      assert(by.mkString == graft.plans.Bpe.byteSymbols(w))
    }
    // vocabBytes layout: ids 0..255 are the byte symbols in byte order
    assert((0 until 256).forall(b =>
      byVocab(graft.plans.Bpe.byteSymbolTable(b).toString) == b))
  }

  test("byte-level merges learn over symbols and bpeLenBytes counts them") {
    // 'th' is the dominant pair in this corpus at byte level too
    val docs = Seq("the the the", "that this", "東京東京").toDF("text")
    val merges = Bpe.mergesOf(Bpe.trainBytes(docs, "text", numMerges = 4))
    assert(merges.head == (("t", "h")), s"got $merges")
    // CJK words count in byte symbols compressed by learned merges — and
    // never UNK: the count is exact whatever the input script
    val got = docs.select(Bpe.bpeLenBytes(col("text"), merges).as("n"))
      .as[Int].collect().toSeq
    assert(got.forall(_ > 0), s"got $got")
    // 東京東京 = 12 byte symbols before merges; learned merges may compress
    val kanji = graft.plans.Bpe.encodeWordBytes("東京東京", merges.toArray)
    assert(kanji.mkString.length == 12)
  }

  test("budgets and packing accept byte-level counts") {
    val docs = Seq(
      (1L, "s", "the the"), (2L, "s", "東京"), (3L, "s", "that")
    ).toDF("id", "src", "text")
    val merges = Bpe.mergesOf(Bpe.trainBytes(docs, "text", numMerges = 4))
    val lens = docs.select(col("id"), Bpe.bpeLenBytes(col("text"), merges).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // budget = everything: the draw must carry the byte-level counts
    val drawn = graft.operators.Mix.tokenBudget(docs, "id", "text", "src",
        budgets = Map("s" -> 10000L), defaultBudget = 0L,
        tokenCount = Some(Bpe.bpeLenBytes(col("text"), merges)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(drawn.keySet == lens.keySet)
    drawn.foreach { case (id, n) => assert(n == lens(id).toLong, s"id $id") }
    // packing with byte-level counts: offsets are cumulative byte-token sums
    val packed = graft.operators.Pack.packSequences(docs, "id", "text", "src",
        maxTokens = 1 << 20, shards = 1,
        tokenCount = Some(Bpe.bpeLenBytes(col("text"), merges)))
      .select("n_tokens").as[Long].collect().toSeq.sorted
    assert(packed == lens.values.map(_.toLong).toSeq.sorted)
  }
}
