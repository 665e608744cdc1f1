package graft.streaming

import graft.operators.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus statistics via mergeable sketches.
  *
  * HLL registers are a plain max-aggregation, so Structured Streaming
  * maintains them incrementally per event-time window with ordinary
  * watermark state semantics — no custom stateful operator, and state per
  * window is bounded at m registers regardless of stream volume (the
  * streaming-native version of the batch sketch's "values never shuffle").
  *
  * Because max is associative, commutative and idempotent, a window's
  * settled register table is IDENTICAL to the batch sketch of the same
  * rows — replays, micro-batch boundaries, and late arrivals within the
  * watermark cannot change it (StreamStatsSpec proves stream == batch).
  * Downstream, window tables merge shard-style via
  * [[graft.operators.Sketch.hllMerge]] for hour→day→corpus rollups, and
  * [[graft.operators.Sketch.hllEstimate]] reads any of them.
  */
object StreamStats {

  /** Per-event-time-window HLL register table for a streaming frame:
    * (window, bucket, rho, p). Late data beyond `watermarkDelay` is dropped
    * by the engine; everything inside it folds into the same registers batch
    * would produce. The constant `p` column matches the batch register
    * schema, so window tables drop `window` and feed straight into
    * [[graft.operators.Sketch.hllMerge]]/[[graft.operators.Sketch.hllEstimate]]
    * with the same precision fail-fast.
    */
  def hllRegistersWindowed(stream: DataFrame, tsCol: String, key: String,
                           windowDur: String, watermarkDelay: String,
                           p: Int = 12): DataFrame = {
    val (bucket, rho) = Sketch.hllProjection(col(key), p)
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), bucket.as("bucket"), rho.as("rho"))
      .groupBy(window(col(tsCol), windowDur), col("bucket"))
      .agg(max("rho").as("rho"))
      .withColumn("p", lit(p))
  }

  /** Per-event-time-window log2-linear QUANTILE sketch for a streaming
    * frame: (window, bucket, cnt) — the streaming twin of the
    * [[graft.operators.Hdr]] percentile MV. Bucket counts are a plain
    * SUM aggregation (associative + commutative), so Structured Streaming
    * maintains them per window with ordinary watermark state, bounded at
    * ≤ 64·2^subBits rows per window regardless of stream volume; a
    * settled window's sketch is IDENTICAL to [[graft.operators.Hdr
    * .sketchBy]] of the same rows (StreamStatsSpec proves it), window
    * tables roll up hour→day→corpus via [[graft.operators.Hdr.mergeBy]],
    * and [[graft.operators.Hdr.quantiles]] reads any of them.
    */
  def hdrSketchWindowed(stream: DataFrame, tsCol: String, valueCol: String,
                        windowDur: String, watermarkDelay: String,
                        subBits: Int = 5): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol),
        graft.operators.Hdr.bucketOf(col(valueCol), subBits).as("bucket"))
      .groupBy(window(col(tsCol), windowDur), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-event-time-window Count-Min counter table for a streaming frame:
    * (window, i, slot, cnt). Counter increments are an associative,
    * commutative SUM — the same mergeability that lets batch CMS shards
    * fold — so Structured Streaming maintains the d·w counters per window
    * with ordinary watermark state; state per window is ≤ d·w longs
    * regardless of stream volume. A settled window's counter table is
    * IDENTICAL to [[graft.operators.Sketch.cmsTable]] of the same rows
    * (shared projection; StreamStatsSpec proves it), and window tables
    * roll up hour→day→corpus by per-(i, slot) addition exactly like
    * batch shard merges.
    */
  def cmsTableWindowed(stream: DataFrame, tsCol: String, key: String,
                       windowDur: String, watermarkDelay: String,
                       d: Int = 4, w: Int = 1024): DataFrame =
    Sketch.cmsProject(stream.withWatermark(tsCol, watermarkDelay),
        key, d, w, carry = Seq(tsCol))
      .groupBy(window(col(tsCol), windowDur), col("i"), col("slot"))
      .agg(count(lit(1)).as("cnt"))
}
