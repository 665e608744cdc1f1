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

  /** Kafka swap-in contract (production; the broker and the
    * spark-sql-kafka connector are absent in this container, so nothing
    * here can execute — resolution happens at `load()`). Option names are
    * the Structured-Streaming Kafka source's public surface; subscribe =
    * the reference's config topic (`KafkaConsumer.php` subscribes one
    * topic, blocking reads → `startingOffsets=earliest` + committed
    * checkpointed progress reproduce its at-least-once consume).
    */
  def kafkaSourceOptions(bootstrapServers: String, topic: String,
                         startingOffsets: String = "earliest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe"               -> topic,
    "startingOffsets"         -> startingOffsets,
    // a consumer loop must outlive topic retention cleanup, like the
    // reference's forever-running CLI consumer
    "failOnDataLoss"          -> "false")

  /** The configured (unresolved, unstarted) Kafka reader for the config
    * topic: `kafkaReader(...).load()` on a cluster with the connector is
    * the only production delta vs the file stream in [[start]].
    */
  def kafkaReader(spark: SparkSession, bootstrapServers: String, topic: String,
                  startingOffsets: String = "earliest"): org.apache.spark.sql.streaming.DataStreamReader =
    spark.readStream.format("kafka")
      .options(kafkaSourceOptions(bootstrapServers, topic, startingOffsets))

  /** Kafka source frame (key/value binary, topic, partition, offset, …) →
    * the one-message-per-row text frame the consumer loop processes. Pure
    * transform: testable against a static frame with the Kafka source
    * schema, no broker needed.
    */
  def kafkaMessages(kafkaFrame: DataFrame): DataFrame =
    kafkaFrame.selectExpr("CAST(value AS STRING) AS value")

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
