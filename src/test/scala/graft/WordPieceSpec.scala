package graft

import graft.operators.{WordPiece => WpOp}
import graft.plans.{WordPiece => Wp}
import org.apache.spark.sql.functions._

/** WordPiece greedy tokenizer: the released-BERT walk semantics on hand
  * fixtures (longest match, whole-word [UNK], the 100-char cap, the
  * head-##-quirk), vocabulary construction invariants, and native
  * expression ≡ Scala model parity on the real corpus.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def vocabOf(ps: String*): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    ps.foreach(s.add)
    s
  }

  test("greedy longest-match walk: the BERT reference examples") {
    val v = vocabOf("un", "##aff", "##able", "runn", "##ing", "run", "##n")
    assert(Wp.encodeWord("unaffable", v).toSeq == Seq("un", "##aff", "##able"))
    // longest-first: 'runn'+'##ing' wins over 'run'+'##n'+'##ing'
    assert(Wp.encodeWord("running", v).toSeq == Seq("runn", "##ing"))
    // any unmatchable position collapses the WHOLE word to [UNK]
    assert(Wp.encodeWord("unaffordable", v).toSeq == Seq(Wp.Unk))
    // over the 100-char cap: [UNK] without walking
    assert(Wp.encodeWord("a" * 101, vocabOf("a", "##a")).toSeq == Seq(Wp.Unk))
    assert(Wp.encodeWord("a" * 100, vocabOf("a", "##a")).length == 100)
  }

  test("upstream quirk preserved: a word starting with ## can match a continuation piece") {
    val v = vocabOf("##ab", "a", "b", "#", "##a", "##b", "###")
    // head surface '##ab' IS checked raw, so the continuation piece matches
    assert(Wp.encodeWord("##ab", v).toSeq == Seq("##ab"))
  }

  test("buildVocab: [UNK]=0, dense ids, unique pieces, single-char cover, no in-corpus UNK") {
    val docs = Seq("the cat sat", "the ##odd cat", "unaffable cat").toDF("text")
    val vocab = WpOp.buildVocab(docs, "text", vocabSize = 64).collect()
    val byPiece = vocab.map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(byPiece(Wp.Unk) == 0)
    assert(vocab.length == byPiece.size, "duplicate pieces")
    assert(vocab.map(_.getInt(1)).sorted.toSeq == (0 until vocab.length),
      "ids must be dense 0..N-1")
    // all single-char heads and continuations of corpus words present
    val words = Seq("the", "cat", "sat", "##odd", "unaffable")
    for (w <- words; i <- w.indices) {
      val p = if (i == 0) w(i).toString else "##" + w(i)
      assert(byPiece.contains(p), s"missing mandatory piece '$p'")
    }
    // with single-char cover, nothing in-corpus encodes to [UNK]
    val vs = new java.util.HashSet[String](); byPiece.keys.foreach(vs.add)
    words.foreach { w =>
      assert(!Wp.encodeWord(w, vs).contains(Wp.Unk), s"word '$w' went UNK")
    }
  }

  test("native expression ≡ Scala model on the real corpus; wpLen ≡ Σ|wpTokens|") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val vocab = WpOp.buildVocab(docs, "text", vocabSize = 512)
    val pieces = WpOp.piecesOf(vocab)
    val vs = new java.util.HashSet[String](); pieces.foreach(vs.add)

    val words = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).distinct().limit(500)
    val got = words.select(col("w"), WpOp.wpTokens(col("w"), pieces).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq)
    got.foreach { case (w, t) =>
      assert(t == Wp.encodeWord(w, vs).toSeq, s"parity drift on '$w'")
    }

    val both = docs.limit(50).select(
      WpOp.wpLen(col("text"), pieces).as("n"),
      aggregate(transform(split(lower(trim(col("text"))), "\\s+"),
        w => when(length(w) > 0, size(WpOp.wpTokens(w, pieces))).otherwise(0)),
        lit(0), (a, x) => a + x).as("m"))
      .collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("q_mlm_mask: 15% selection, 80/10/10 actions, deterministic, semantics per action") {
    val got = graft.queries.LlmQueries.qMlmMask(spark, sfDir)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
    val totalWords = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).count()
    val rate = rows.length.toDouble / totalWords
    assert(rate > 0.12 && rate < 0.18, s"selection rate $rate drifted from 15%")
    val byAction = rows.groupBy(_._4).view.mapValues(_.length).toMap
    val n = rows.length.toDouble
    assert(math.abs(byAction("mask") / n - 0.8) < 0.05)
    assert(math.abs(byAction.getOrElse("random", 0) / n - 0.1) < 0.05)
    assert(math.abs(byAction.getOrElse("keep", 0) / n - 0.1) < 0.05)
    // action semantics
    rows.foreach {
      case (_, _, _, "mask", rep)        => assert(rep == "[MASK]")
      case (_, _, orig, "keep", rep)     => assert(rep == orig)
      case (_, _, _, "random", rep)      => assert(rep != "[MASK]" && rep.nonEmpty)
      case other                          => fail(s"unexpected action row $other")
    }
    // deterministic: a second run is identical
    val again = graft.queries.LlmQueries.qMlmMask(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(rows.toSeq == again.toSeq)
  }
}
