package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the attribution stream (touch or purchase). `event_ts` is
  * `ts_ms` as a timestamp — the watermark column, which must flow into the
  * stateful operator for event-time timeouts to be legal.
  */
final case class AttrEvent(user_id: Long, ts_ms: Long, event_id: Long,
                           event_type: String, value_u: Long,
                           event_ts: java.sql.Timestamp)

/** An attributed purchase: which touch type (or "none") gets the credit. */
final case class Attributed(user_id: Long, event_id: Long, touch_type: String,
                            value_u: Long)

/** The last touch a user produced — the WHOLE per-user state. */
final case class LastTouch(tsMs: Long, eventId: Long, ttype: String)

/** Streaming LAST-TOUCH attribution — the unbounded twin of
  * `q_attribution`: clicks/views update one per-user "last touch" state
  * cell, purchases emit immediately with the credit decided at arrival
  * (the shape a live marketing dashboard needs — no windowed re-join, no
  * end-of-day batch).
  *
  * Semantics are the batch query's, pinned: a purchase credits the most
  * recent touch at-or-before its instant ((ts, is-purchase, event_id)
  * order — same-instant touches count, one-instant touch ties break by
  * highest event id), and only within the attribution window (7 days).
  *
  * Scale: state is ONE (ts, id, type) triple per user, hash-partitioned
  * by user across executors — no event buffering; within a micro-batch
  * the group's events sort locally (per-user-per-batch bounded). State is
  * BOUNDED to recently-active users, not lifetime users: a touch can only
  * earn credit for 7 days, so each state cell carries an event-time
  * timeout at touch + 7d and is evicted once the watermark passes it —
  * the cell is provably useless then, because every still-on-time
  * purchase has ts > watermark ≥ touch + 7d. Late touches that arrive
  * AFTER a purchase already emitted do not re-attribute it (append-mode
  * streams don't retract), and rows later than `lateness` behind the
  * stream's max event time are dropped by the watermark — the documented
  * divergences from a batch recompute under out-of-order arrival across
  * batch boundaries; within one batch the sort restores event-time order.
  */
object AttributionGate {

  private val WindowMs = 7L * 86400000L

  /** @param lateness watermark delay (how far out-of-order touches and
    *                  purchases may arrive, e.g. "1 day"); per-user state
    *                  lives at most 7 days + lateness past its touch. */
  def attribute(events: DataFrame, lateness: String = "1 day"): DataFrame = {
    implicit val evEnc: Encoder[AttrEvent] = Encoders.product[AttrEvent]
    implicit val outEnc: Encoder[Attributed] = Encoders.product[Attributed]
    implicit val stEnc: Encoder[LastTouch] = Encoders.product[LastTouch]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events
      .select(col("user_id").cast("long"), col("ts_ms").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"),
        col("value_u").cast("long"))
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("event_ts", lateness)
      .as[AttrEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastTouch, Attributed](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[AttrEvent], state: GroupState[LastTouch]) =>
          if (state.hasTimedOut) {
            // watermark passed touch + 7d: no on-time purchase can credit it
            state.remove()
            Iterator.empty
          } else {
            // event-time order within the batch; purchases sort AFTER the
            // touches they tie with (the batch query's isp key)
            val ordered = rows.toArray.sortBy(e =>
              (e.ts_ms, if (e.event_type == "purchase") 1 else 0, e.event_id))
            val out = Vector.newBuilder[Attributed]
            var lt = state.getOption.orNull
            ordered.foreach { e =>
              if (e.event_type == "purchase") {
                val credited =
                  if (lt != null && e.ts_ms - lt.tsMs <= WindowMs) lt.ttype else "none"
                out += Attributed(e.user_id, e.event_id, credited, e.value_u)
              } else if (e.event_type == "click" || e.event_type == "view") {
                // higher (ts, event_id) wins — the pinned tie-break; other
                // event types (signup, error, …) are not touches
                if (lt == null || lt.tsMs < e.ts_ms ||
                    (lt.tsMs == e.ts_ms && lt.eventId < e.event_id))
                  lt = LastTouch(e.ts_ms, e.event_id, e.event_type)
              }
            }
            if (lt != null) {
              state.update(lt)
              // an already-stale touch can't set a timeout behind the
              // watermark; park it one tick ahead so the next advance evicts
              state.setTimeoutTimestamp(
                math.max(lt.tsMs + WindowMs, state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
      .toDF()
  }
}
