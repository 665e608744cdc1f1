package graft.streaming

import graft.config.InputConfig
import graft.operators.Aggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's consumer loop (/root/reference/src/Command/
  * ConsumerCommand.php + KafkaConsumer.php): block on a topic of config
  * messages, run one aggregation per message, produce the normalized rows.
  *
  * Streaming shape here: a file/Kafka stream of config JSON lines →
  * `foreachBatch` → parse each message on the driver (control plane, one
  * tiny JSON per pipeline run) → `Aggregator.run` builds the distributed
  * job → sink. Config-level errors are caught per message and reported to
  * `onError`, like the reference's try/log/continue loop — one malformed
  * message must not kill the consumer.
  */
object ConfigConsumer {

  def start(
      spark: SparkSession,
      configDir: String,
      checkpoint: String,
      resolver: Aggregator.SourceResolver,
      sink: (InputConfig, DataFrame) => Unit,
      onError: (String, Throwable) => Unit = (m, e) => System.err.println(s"[consumer] failed: ${e.getMessage} in $m"),
      key: String = "upc",
      orderCol: Option[String] = None,
      onStats: (InputConfig, graft.operators.Metrics.RunStats) => Unit =
        (cfg, st) => System.err.println(st.render(s"Supplier (${cfg.name}) (${cfg.supplierId})"))): StreamingQuery = {

    spark.readStream
      .option("maxFilesPerTrigger", "16")
      .text(configDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val messages = batch.collect().map(_.getString(0)).filter(_.trim.nonEmpty)
        messages.foreach { msg =>
          try {
            val config = InputConfig.fromJson(msg)
            val feed = Aggregator.run(spark, config, resolver, key, orderCol)
            // stats ride the sink's own action (observe) — the reference's
            // per-message outputStats, with row counts instead of RSS
            val (_, stats) = graft.operators.Metrics.timed(feed, key)(f => sink(config, f))
            onStats(config, stats)
          } catch {
            case e: Throwable => onError(msg, e)
          }
        }
        // caches persisted inside operators (Dedup.nearDupPairs) must not
        // outlive the batch in a forever-running consumer
        graft.operators.Caches.release()
      }
      .start()
  }
}
