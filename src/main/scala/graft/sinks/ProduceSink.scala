package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Output side of the pipeline, mirroring the reference's KafkaProducer
  * (/root/reference/src/Service/Kafka/KafkaProducer.php): each normalized
  * row is produced as one JSON message. Kafka isn't in this container; the
  * public `spark.writeStream.format("kafka")` sink takes the exact frame
  * shape [[toMessages]] produces (key + value), so swapping the format
  * string is the only production delta.
  */
object ProduceSink {

  /** (key, value) JSON message frame from a normalized feed: key = the
    * dedupe key column, value = the whole row as JSON.
    */
  def toMessages(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** Batch produce: JSON-lines files (message values; the key column rides
    * inside the JSON as well, as the reference's DataRow payload does).
    */
  def writeJsonl(df: DataFrame, keyCol: String, path: String): Unit =
    toMessages(df, keyCol).select("value").write.mode("overwrite").format("text").save(path)

  /** Streaming produce to a directory sink (swap format to "kafka" +
    * kafka.bootstrap.servers in production).
    */
  def streamTo(df: DataFrame, keyCol: String, path: String, checkpoint: String): StreamingQuery =
    toMessages(df, keyCol)
      .select(to_json(struct(col("key"), col("value"))).as("value"))
      .writeStream
      .format("text")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Kafka swap-in contract (production; broker + connector absent here, so
    * nothing executes — resolution happens at `start()`). The Kafka sink
    * consumes exactly the (key string, value string) frame [[toMessages]]
    * already produces; topic routes via the sink option like the
    * reference's producer (`KafkaProducer.php` produces to one configured
    * output topic). The checkpoint carries the exactly-once-per-epoch sink
    * state, the same contract [[streamTo]] pins for the file sink.
    */
  def kafkaSinkOptions(bootstrapServers: String, topic: String,
                       checkpoint: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "topic"                   -> topic,
    "checkpointLocation"      -> checkpoint)

  /** The configured (unstarted) Kafka writer: `.start()` on a cluster with
    * the connector is the only production delta vs [[streamTo]].
    */
  def kafkaWriter(df: DataFrame, keyCol: String, bootstrapServers: String,
                  topic: String, checkpoint: String): DataStreamWriter[Row] =
    toMessages(df, keyCol)
      .writeStream
      .format("kafka")
      .options(kafkaSinkOptions(bootstrapServers, topic, checkpoint))
}
