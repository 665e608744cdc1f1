package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage-dedup primitive behind
  * dataset versioning and delta-sync (LBFS/rsync lineage): chunk
  * boundaries come from the CONTENT (a local hash predicate), not from
  * fixed offsets, so inserting or deleting bytes only disturbs the chunks
  * overlapping the edit — downstream chunks re-align and dedup against the
  * previous version. Fixed-width chunking loses every chunk after an edit;
  * the whole-doc dedup family ([[Dedup]]) can't give partial credit for a
  * 99%-identical re-crawl. At 100 TB corpus-versioning scale, chunk-level
  * dedup is the difference between re-storing the crawl and storing the
  * delta.
  *
  * Boundary rule (position-LOCAL, deliberately): a cut falls after char i
  * iff md5 of the k-char window ending at i starts with `maskHex`. Classic
  * CDC adds min/max chunk bounds, which makes each cut depend on the
  * previous one — a sequential chain that neither distributes within a doc
  * nor replays in SQL. The pure-local rule keeps every boundary decision
  * independent (expected chunk = 16^|maskHex| chars), keeps the resync
  * property, and makes the whole operator one doc-local expression tree —
  * no shuffle, no UDF, embarrassingly parallel.
  */
object Cdc {

  /** Per-document chunks: (id, chunk_idx, start, chunk_len, chunk_hash) —
    * `start` 1-based, hash = md5 of the chunk text. `k` = boundary window
    * chars, `maskHex` = required md5 hex prefix for a cut.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 8, maskHex: String = "00"): DataFrame = {
    require(k >= 1, s"window must be >= 1, got $k")
    require(maskHex.nonEmpty && maskHex.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      s"maskHex must be lowercase hex, got '$maskHex'")
    require(maskHex.length <= 32,
      s"maskHex longer than an md5 digest (32 hex chars): '$maskHex'")
    val t = col("t")
    val n = length(t)
    // cut positions: window [i-k+1, i] hashes into the mask. ONE native
    // pass (graft_cdc_cuts) — the declarative filter(sequence(...),
    // md5(substr(...))) is result-identical but pays an interpreted
    // md5+substr+encode chain per CHARACTER (~8× slower measured); the
    // SQL oracle still replays that declarative form, which is the
    // equality proof for the native expression
    val cuts = graft.plans.NativeHash.cdcCuts(t, k, maskHex)
    val starts = concat(array(lit(1)), transform(col("cuts"), c => c + 1))
    val ends = concat(col("cuts"), array(n))
    docs.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("cuts", cuts)
      .select(col("id"), t,
        posexplode(filter(zip_with(starts, ends, (s, e) => struct(s.as("s"), e.as("e"))),
          p => p.getField("e") >= p.getField("s"))).as(Seq("chunk_idx", "se")))
      .select(col("id").as(idCol), col("chunk_idx"),
        col("se").getField("s").as("start"),
        (col("se").getField("e") - col("se").getField("s") + 1).as("chunk_len"),
        md5(encode(t.substr(col("se").getField("s"),
          col("se").getField("e") - col("se").getField("s") + 1), "UTF-8")).as("chunk_hash"))
  }

  /** Corpus-level dedup accounting over the chunk index: total vs distinct
    * chunks/bytes — the "how much does chunk-level dedup save" report.
    * Slim (hash, len) shuffle with map-side combine; nothing doc-sized
    * moves.
    */
  def dedupStats(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 8, maskHex: String = "00"): DataFrame =
    chunks(docs, idCol, textCol, k, maskHex)
      .groupBy("chunk_hash").agg(max(col("chunk_len")).as("len"), count(lit(1)).as("copies"))
      .agg(
        sum(col("copies")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("len") * col("copies")).as("chars_total"),
        sum(col("len")).as("chars_distinct"))

  /** CROSS-SNAPSHOT delta accounting — the versioning use-case CDC exists
    * for: chunk snapshot t+1 against snapshot t's chunk-hash store and
    * report how much of the re-crawl is genuinely new. One row:
    * (n_chunks, n_reused, n_new, chars_total, chars_new) over the NEW
    * snapshot's chunks. Reuse is CONTENT-addressed — a chunk that moved to
    * a different document or offset still reuses (that is the resync
    * property paying off); `chars_new` is the delta-storage estimate: what
    * a chunk store must add to hold t+1 given it already holds t.
    *
    * Scale: both chunkings are doc-local expression trees (no shuffle);
    * the old side reduces to its DISTINCT hash set (slim, map-side-
    * combined); membership is one hash-keyed join of slim (hash, len)
    * rows; the report is a single 5-cell aggregation. Nothing doc-sized
    * shuffles.
    */
  def deltaStats(oldDocs: DataFrame, newDocs: DataFrame, idCol: String, textCol: String,
                 k: Int = 8, maskHex: String = "00"): DataFrame = {
    val oldH = chunks(oldDocs, idCol, textCol, k, maskHex)
      .select(col("chunk_hash")).distinct().withColumn("__seen", lit(1))
    chunks(newDocs, idCol, textCol, k, maskHex)
      .join(oldH, Seq("chunk_hash"), "left")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__seen").isNotNull, 1L).otherwise(0L)).as("n_reused"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(col("chunk_len").cast("long")).as("chars_total"),
        sum(when(col("__seen").isNull, col("chunk_len").cast("long")).otherwise(lit(0L)))
          .as("chars_new"))
  }
}
