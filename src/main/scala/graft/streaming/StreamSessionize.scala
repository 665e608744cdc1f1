package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-sessionization on Spark's NATIVE session window.
  *
  * The reference consumes an unbounded Kafka event feed one message at a
  * time (`ConsumerCommand.php`, `KafkaConsumer.php:13-25`); the analytics
  * twin of that feed is per-user session rollups that close as the stream
  * advances. Rather than hand-rolling state with
  * `flatMapGroupsWithState`, this rides `session_window()` — the engine
  * owns merge-on-arrival, state eviction at the watermark, and emits each
  * session EXACTLY ONCE in append mode when the watermark passes its end
  * (no new event can extend it). Out-of-order events inside the lateness
  * bound merge/extend sessions retroactively; events later than the bound
  * are dropped by the watermark, never resurrecting a closed session.
  *
  * Session semantics (pinned by SessionWindowSpec on the exact boundary):
  * an event at EXACTLY `last_ts + gap` still MERGES into the running
  * session — the engine combines windows that overlap or touch — so a
  * session breaks only on `diff > gap`, the same rule as the batch
  * `q_events_sessionize` lag formulation, and the settled stream is
  * row-identical to the batch `q_session_window` frame.
  *
  * Input contract: (`user_id`, `ts_ms` epoch-millis LONG, `value_u`
  * micro-unit LONG). Millis + micro-units keep every gate-compared value
  * integral — the house cross-engine rule.
  */
object StreamSessionize {

  val GapMs = 1800000L // 30 minutes, the q_events_sessionize contract

  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 lateness: String = "1 millisecond"): DataFrame =
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value_u")).as("value_u"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        unix_millis(col("session_window.end")).as("session_end_ms"),
        col("n_events"), col("value_u"))
}
