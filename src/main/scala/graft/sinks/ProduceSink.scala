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
}
