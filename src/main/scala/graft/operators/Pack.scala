package graft.operators

import graft.functions.{Sampling, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate a deterministic
  * per-stratum document stream and cut it into fixed-size token windows
  * (the GPT-style "pack then chunk" shape). Each document reports the
  * sequence it starts in and its offset there; documents may straddle a
  * boundary — the trainer's chunker splits them, exactly like a packed
  * tokenized corpus on disk.
  *
  * Scale: packing is inherently sequential IN THE ORDER THAT DEFINES THE
  * STREAM, so the stream is sharded first — `shards` hash-shards per
  * stratum, each packed independently by a window over (stratum, shard).
  * Parallelism = |strata| × shards regardless of corpus size; shard
  * assignment is the deterministic md5 bucket, so re-runs give identical
  * sequences on any cluster.
  */
object Pack {

  /** @param maxTokens window length in tokens
    * @param shards    independent packing streams per stratum
    * @param tokenCount how to count a document's tokens — defaults to the
    *         whitespace count; pass [[Bpe.bpeLen]] to pack in model tokens
    * @return input columns + n_tokens, shard, seq_id (global within
    *         (stratum, shard)), seq_offset (token offset within seq_id)
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
                    maxTokens: Int, shards: Int = 64,
                    tokenCount: Option[Column] = None): DataFrame = {
    require(maxTokens > 0 && shards > 0)
    val shard = Sampling.md5Bucket(col(idCol), shards)
    val toks: Column =
      tokenCount.getOrElse(TextFunctions.tokenCountWs(col(textCol))).cast("long")
    val w = Window.partitionBy(col(stratumCol), col("shard"))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", shard)
      .withColumn("n_tokens", toks)
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", ((col("__cum") - col("n_tokens")) / maxTokens).cast("long"))
      .withColumn("seq_offset", (col("__cum") - col("n_tokens")) % maxTokens)
      .drop("__cum")
  }

  /** Overlapping token-window CHUNKING (RAG / long-context prep): each
    * document splits into `chunkSize`-token windows whose starts step by
    * `stride` (stride < chunkSize ⇒ the standard sliding overlap; stride =
    * chunkSize ⇒ an exact partition of the token stream). Chunk starts are
    * generated while start < n_tokens, so every token lands in ≥1 chunk and
    * the final chunk may run short — the shape retrieval chunkers emit.
    * Zero-token documents emit NO chunks (they are filtered before the
    * explode): a RAG consumer never receives an empty chunk.
    *
    * Purely per-row (explode bounded by ⌈len/stride⌉ per document): no
    * shuffle, no state — chunking 100 TB is embarrassingly parallel and
    * this plan keeps it that way.
    *
    * @return (idCol, chunk_idx, chunk_start, n_chunk_tokens, chunk_text)
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__t"), size(toks).as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"), col("__n"),
        posexplode(sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(stride))))
      .select(col(idCol),
        col("pos").cast("int").as("chunk_idx"),
        col("col").cast("int").as("chunk_start"),
        least(col("__n") - col("col"), lit(chunkSize)).cast("int").as("n_chunk_tokens"),
        array_join(slice(col("__t"), col("col") + 1, lit(chunkSize)), " ").as("chunk_text"))
  }
}
