package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM vocabulary construction + apply — the VITERBI tokenizer
  * family closing the three public sub-word algorithms next to [[Bpe]]
  * (merge-rank) and [[WordPiece]] (greedy longest-match).
  *
  * Vocabulary recipe (frequency-scored, NOT the EM likelihood trainer —
  * this library's vocab exists to pin deterministic, oracle-replayable
  * segmentation, and the INFERENCE algorithm is SentencePiece's Viterbi
  * DP either way): every substring of every corpus word up to
  * [[graft.plans.Unigram.PieceLenMax]] code points is a candidate (plain
  * surface — the unigram model has no `##` continuation marking), scored
  * by occurrence count weighted by word frequency. The vocabulary keeps
  * `[UNK]` at id 0, ALL single-character pieces (so every in-corpus word
  * within the length cap is encodable — the char-fallback guarantee
  * SentencePiece gets from byte fallback), then the highest-scoring
  * candidates up to `vocabSize`; ids are dense ranks of (mandatory-first,
  * score desc, piece asc).
  *
  * Each piece carries an INTEGER cost — the −log p analogue on the
  * bit-length lens: cost = ⌊log₂ Σscore⌋ − ⌊log₂ score⌋ + 1 ≥ 1, so a
  * piece twice as frequent is one bit cheaper and every extra token
  * costs at least 1 (fewer-tokens bias, like a real LM's per-token
  * probability mass). Integer costs make the Viterbi DP exact in any
  * engine — no floating log-prob to drift.
  *
  * Scale shape: one corpus scan → word-frequency aggregate (map-side
  * combine), a bounded ≤ L·(L+1)/2-per-distinct-word candidate explode,
  * one candidate aggregate, a [[Scale.globalRowNumber]] rank, and a
  * 1-row total-mass broadcast for the cost lens. The vocab travels to
  * the encoder as a foldable literal ([[graft.plans.Unigram]]).
  */
object Unigram {

  /** (piece, token_id, score, cost) — `[UNK]` at id 0 cost 0, pieces at
    * dense 1..V-1 with ≥1 integer Viterbi costs.
    */
  def buildVocab(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize > 1, "vocabSize must leave room beyond [UNK]")
    val L = graft.plans.Unigram.PieceLenMax
    val words = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= graft.plans.Unigram.MaxChars)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val cand = words
      .select(col("w"), col("freq"), explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("freq"), col("p"),
        explode(sequence(lit(1),
          least(lit(L), length(col("w")) - col("p") + lit(1)))).as("l"))
      .select(col("freq"), expr("substring(w, p, l)").as("piece"), col("l"))
      .filter(!col("piece").contains(lit(graft.plans.Unigram.FieldSep.toString)) &&
        !col("piece").contains(lit(graft.plans.Unigram.CostSep.toString)))
    val scored = cand.groupBy("piece").agg(sum("freq").as("score"),
      max(when(col("l") === 1, 1).otherwise(0)).as("mand"))
    val kept = Scale.globalRowNumber(
      scored.withColumn("neg_mand", -col("mand")).withColumn("neg_score", -col("score")),
      Seq("neg_mand", "neg_score", "piece"), "token_id")
      .filter(col("token_id") <= vocabSize - 1)
      .select(col("piece"), col("token_id").cast("int").as("token_id"),
        col("score").cast("long").as("score"))
    val total = kept.agg(sum("score").as("total"))
    kept.crossJoin(broadcast(total))
      .select(col("piece"), col("token_id"), col("score"),
        ((length(bin(col("total"))) - 1) - (length(bin(col("score"))) - 1) + 1)
          .cast("int").as("cost"))
      .unionByName(
        docs.sparkSession.range(1).select(
          lit(graft.plans.Unigram.Unk).as("piece"), lit(0).cast("int").as("token_id"),
          lit(0L).as("score"), lit(0).cast("int").as("cost")))
  }

  /** Vocabulary (piece, cost) entries in token_id order, `[UNK]` excluded
    * (the encoder treats it as a sentinel, not a matchable piece).
    */
  def entriesOf(vocab: DataFrame): Seq[(String, Int)] =
    vocab.filter(col("token_id") > 0).orderBy("token_id")
      .select("piece", "cost").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq

  /** Viterbi-encoded piece array of a single word. */
  def ugTokens(word: Column, entries: Seq[(String, Int)]): Column =
    call_function("graft_unigram_tokens", word,
      lit(graft.plans.Unigram.serializeVocab(entries)))
}
