package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-touch attribution as a TRUE stream-stream event-time interval
  * join — the two-stream shape next to [[AttributionGate]]'s keyed-state
  * formulation: the touch stream (clicks/views) joins the purchase stream
  * within a 7-day event-time band, then a windowed aggregation reduces
  * each purchase's matched touches to the most recent one (the credit).
  *
  * Reference anchor: the consumer→producer flow (`ConsumerCommand.php`)
  * is a keyed enrich-join at stream scale; this is that join with
  * event-time banding instead of table lookup.
  *
  * State bounds (the contract): BOTH sides carry a watermark, so the join
  * buffers only rows inside the band — a touch is held until the
  * watermark passes touch + 7d (no later purchase can match it), a
  * purchase until the watermark passes its own instant (all of its
  * touches must have arrived); the downstream per-purchase window state
  * closes when the watermark passes window end. Everything is
  * hash-partitioned by user/window — per-executor state ∝ 7 days of that
  * executor's traffic, never stream lifetime.
  *
  * Semantics vs the batch `q_attribution` (settled output, spec-proved):
  * identical per-purchase credit. The batch query takes the most recent
  * touch at-or-before the purchase and nulls it past 7 days; the most
  * recent IN-BAND touch is the same touch whenever one exists, and the
  * left-outer join's null row is exactly the no-in-band-touch case →
  * "none". Ties replay too: same-instant touches are in the band
  * (t ≤ p inclusive) and the struct-max tie-breaks by highest event id —
  * the batch (ts, isp, event_id) order. The divergence class is the
  * streaming-inherent one [[AttributionGate]] documents: rows later than
  * `lateness` are dropped, and append-mode output never retracts.
  */
object IntervalAttribution {

  /** Per-purchase credited output: (user_id, event_id, ts_ms, touch_type,
    * value_u), one row per purchase once its event-time window settles.
    *
    * @param events   streaming frame with user_id, ts_ms, event_id,
    *                 event_type, value_u (the [[AttributionGate]] shape)
    * @param lateness watermark delay on BOTH streams
    * @param windowDur event-time window for the per-purchase reduction —
    *                 purely an output-latency knob (each purchase is one
    *                 group member; the window exists so the aggregation's
    *                 state closes)
    */
  def attribute(events: DataFrame, lateness: String = "1 day",
                windowDur: String = "1 hour"): DataFrame = {
    val ev = events
      .select(col("user_id").cast("long"), col("ts_ms").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"),
        col("value_u").cast("long"))
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("t_user"), col("ts_ms").as("t_ts_ms"),
        col("event_id").as("t_event_id"), col("event_type").as("t_type"),
        col("event_ts").as("t_event_ts"))
      .withWatermark("t_event_ts", lateness)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_ms").as("p_ts_ms"),
        col("event_id").as("p_event_id"), col("value_u"),
        col("event_ts").as("p_event_ts"))
      .withWatermark("p_event_ts", lateness)
    val banded = purchases.join(touches,
      col("p_user") === col("t_user") &&
        col("t_event_ts") <= col("p_event_ts") &&
        col("t_event_ts") >= col("p_event_ts") - expr("INTERVAL 7 DAYS"),
      "leftOuter")
    banded
      .groupBy(window(col("p_event_ts"), windowDur),
        col("p_user"), col("p_event_id"), col("p_ts_ms"), col("value_u"))
      // most recent in-band touch, ties by highest event id — the batch
      // order; an unmatched purchase contributes one all-null touch row,
      // whose struct surfaces as the null t_type below
      .agg(max(struct(col("t_ts_ms"), col("t_event_id"), col("t_type"))).as("lt"))
      .select(col("p_user").as("user_id"), col("p_event_id").as("event_id"),
        col("p_ts_ms").as("ts_ms"),
        coalesce(col("lt.t_type"), lit("none")).as("touch_type"),
        col("value_u"))
  }
}
