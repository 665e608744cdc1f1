package graft

import graft.sinks.ProduceSink
import graft.streaming.ConfigConsumer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka swap-in readiness: the container has no broker and no
  * spark-sql-kafka connector, so the production reader/writer cannot
  * execute — these specs pin everything that CAN be pinned without a
  * broker: the exact option names/values, the checkpoint contract, the
  * message-frame schema the Kafka sink requires, and the kafka-source →
  * consumer-message decode as a pure transform over a frame with the Kafka
  * source's public schema.
  */
class KafkaSwapInSpec extends SparkSpec {

  test("source option contract: bootstrap/subscribe/offsets/dataloss names pinned") {
    val opts = ConfigConsumer.kafkaSourceOptions("broker1:9092,broker2:9092", "supplier-configs")
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe"               -> "supplier-configs",
      "startingOffsets"         -> "earliest",
      "failOnDataLoss"          -> "false"))
    // configured reader builds without resolving the source (load() is the
    // production-only step)
    val reader = ConfigConsumer.kafkaReader(spark, "broker1:9092", "supplier-configs")
    assert(reader != null)
  }

  test("sink option contract: bootstrap/topic/checkpoint names pinned; writer builds unstarted") {
    val opts = ProduceSink.kafkaSinkOptions("broker1:9092", "normalized-feed", "/tmp/ckpt")
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "broker1:9092",
      "topic"                   -> "normalized-feed",
      "checkpointLocation"      -> "/tmp/ckpt"))
    // writeStream demands a STREAMING frame — a rate-source feed stands in
    // (built-in source; nothing starts, so nothing needs a broker)
    val feed = spark.readStream.format("rate").load()
      .select(col("value").cast("string").as("upc"), lit(9.5).as("price"))
    val writer = ProduceSink.kafkaWriter(feed, "upc", "broker1:9092", "normalized-feed", "/tmp/ckpt")
    assert(writer != null) // .start() would resolve the connector — production only
  }

  test("message frame matches the Kafka sink's required shape: key/value strings") {
    import spark.implicits._
    val feed = Seq(("111", 9.5), ("222", 1.5)).toDF("upc", "price")
    val msgs = ProduceSink.toMessages(feed, "upc")
    assert(msgs.columns.toSeq == Seq("key", "value"))
    assert(msgs.schema("key").dataType == StringType)
    assert(msgs.schema("value").dataType == StringType)
    val rows = msgs.orderBy("key").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("111", "222"))
    assert(rows.head.getString(1) == """{"upc":"111","price":9.5}""")
  }

  test("kafka source frame decodes to the consumer's message lines (pure transform)") {
    // the Kafka source's public schema (Structured Streaming + Kafka
    // integration): binary key/value + topic/partition/offset/timestamps
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val cfg = """{"supplier_id":7,"name":"acme","type_id":2,"source":"feed_7",""" +
      """"column_map_rules":{"upc":"UPC","price":["Price","float"]},"version":1}"""
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(null, cfg.getBytes("UTF-8"), "supplier-configs", 0, 42L,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 0))
    val kafkaFrame = spark.createDataFrame(rows, kafkaSchema)
    val msgs = ConfigConsumer.kafkaMessages(kafkaFrame)
    assert(msgs.columns.toSeq == Seq("value"))
    assert(msgs.collect().head.getString(0) == cfg)
    // and the decoded line is exactly what the consumer loop parses
    val parsed = graft.config.InputConfig.fromJson(msgs.collect().head.getString(0))
    assert(parsed.supplierId == 7L && parsed.typeId.contains(2))
  }
}
