package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece vocabulary construction + apply — the greedy-match tokenizer
  * family next to [[Bpe]] (the reference pipeline normalizes free-text
  * supplier fields before keying on them, `Mapper.php:21-135`; a training
  * pipeline's analogue is sub-word segmentation under a FIXED vocabulary,
  * the BERT-family contract).
  *
  * Vocabulary recipe (frequency-scored, NOT the likelihood trainer — this
  * library's vocab exists to pin deterministic, oracle-replayable
  * segmentation, and the INFERENCE algorithm is the released BERT greedy
  * matcher either way): every substring of every corpus word up to
  * [[CoreLenMax]] code points becomes a candidate — plain surface when it
  * starts the word, `##`-prefixed otherwise — scored by occurrence count
  * weighted by word frequency. The vocabulary keeps `[UNK]` at id 0, ALL
  * single-character pieces (so no in-corpus word within the length cap can
  * be unencodable), then the highest-scoring candidates up to `vocabSize`;
  * ids are dense ranks of (mandatory-first, score desc, piece asc) — fully
  * deterministic, ties broken lexically.
  *
  * Scale shape: one corpus scan → word-frequency aggregate (map-side
  * combine), a bounded ≤ L·(L+1)/2-per-distinct-word candidate explode,
  * one candidate aggregate, and a [[Scale.globalRowNumber]] rank over the
  * candidate frame. The vocab itself is control-plane sized and travels
  * to the encoder as a literal ([[graft.plans.WordPiece]]).
  */
object WordPiece {

  val CoreLenMax = 12 // max piece CORE length in code points (surface ≤ 14)

  /** (piece, token_id, score) — `[UNK]` at id 0, pieces at dense 1..V-1. */
  def buildVocab(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize > 1, "vocabSize must leave room beyond [UNK]")
    val words = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= graft.plans.WordPiece.MaxChars)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val cand = words
      .select(col("w"), col("freq"), explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("freq"), col("p"),
        explode(sequence(lit(1),
          least(lit(CoreLenMax), length(col("w")) - col("p") + lit(1)))).as("l"))
      .select(col("freq"),
        when(col("p") === 1, expr("substring(w, p, l)"))
          .otherwise(concat(lit("##"), expr("substring(w, p, l)"))).as("piece"),
        col("l"))
      .filter(!col("piece").contains(lit(graft.plans.WordPiece.FieldSep.toString)))
    // group by SURFACE only: "##a" can arise both as a continuation of
    // core 'a' AND as the head substring of a word literally starting
    // with "##" — the vocabulary is a set of surfaces, so scores combine
    // and mandatory-ness is "any origin had core length 1"
    val scored = cand.groupBy("piece").agg(sum("freq").as("score"),
      max(when(col("l") === 1, 1).otherwise(0)).as("mand"))
    val ranked = Scale.globalRowNumber(
      scored.withColumn("neg_mand", -col("mand")).withColumn("neg_score", -col("score")),
      Seq("neg_mand", "neg_score", "piece"), "token_id")
      .filter(col("token_id") <= vocabSize - 1)
      .select(col("piece"), col("token_id").cast("int").as("token_id"),
        col("score").cast("long").as("score"))
    ranked.unionByName(
      docs.sparkSession.range(1).select(
        lit(graft.plans.WordPiece.Unk).as("piece"),
        lit(0).cast("int").as("token_id"), lit(0L).as("score")))
  }

  /** Vocabulary pieces in token_id order (the literal the encoder ships). */
  def piecesOf(vocab: DataFrame): Seq[String] =
    vocab.orderBy("token_id").collect().map(_.getString(0)).toSeq

  /** Encoded piece array of a single word. */
  def wpTokens(word: Column, pieces: Seq[String]): Column =
    call_function("graft_wordpiece_tokens", word,
      lit(graft.plans.WordPiece.serializeVocab(pieces)))

  /** Total WordPiece token count of a text column. */
  def wpLen(text: Column, pieces: Seq[String]): Column =
    call_function("graft_wordpiece_len", text,
      lit(graft.plans.WordPiece.serializeVocab(pieces)))
}
