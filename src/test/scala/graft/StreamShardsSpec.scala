package graft

import graft.operators.{Mix, Sketch}
import graft.streaming.{StreamShards, StreamStats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming parity for the accounting layer: windowed CMS counters settle
  * to the batch sketch, and the foreachBatch shard sink extends the global
  * token stream across batches with exactly-once offset accounting.
  */
class StreamShardsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("windowed streaming CMS counters == batch cmsTable of the same rows") {
    implicit val sq = spark.sqlContext
    val b1 = Seq((ts(1), "the"), (ts(2), "of"), (ts(3), "the"), (ts(11), "xq"))
    val b2 = Seq((ts(4), "the"), (ts(2), "of"), (ts(13), "xq"), (ts(14), "of"))
    val in = MemoryStream[(Timestamp, String)]
    val counters = StreamStats.cmsTableWindowed(
      in.toDF().toDF("ts", "k"), "ts", "k", "10 minutes", "30 minutes", d = 4, w = 64)
    val q = counters.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("cms_stream")
        .select(col("window.start").cast("long").as("ws"), col("i"), col("slot"), col("cnt"))
        .orderBy("ws", "i", "slot").collect().toSeq
      val expected = (b1 ++ b2).toDF("ts", "k")
        .select(window(col("ts"), "10 minutes").as("window"), col("ts"), col("k"))
        .select(col("window.start").cast("long").as("ws"), col("k"))
        .groupBy("ws", "k").count()
        // replay the shared projection per window over the raw rows
        .select(col("ws"), col("k"), col("count"))
        .as[(Long, String, Long)].collect()
        .flatMap { case (ws, k, n) => (1L to n).map(_ => (ws, k)) }
        .toSeq.toDF("ws", "k")
      val exp = Sketch.cmsProject(expected, "k", d = 4, w = 64, carry = Seq("ws"))
        .groupBy("ws", "i", "slot").agg(count(lit(1)).as("cnt"))
        .orderBy("ws", "i", "slot").collect().toSeq
      assert(got == exp)
    } finally q.stop()
  }

  test("window CMS tables merge by addition into the whole-stream sketch") {
    val rows = Seq("a", "b", "a", "c", "a", "b").toDF("k")
    val whole = Sketch.cmsTable(rows, "k", d = 4, w = 64)
    val w0 = Sketch.cmsTable(Seq("a", "b", "a").toDF("k"), "k", d = 4, w = 64)
    val w1 = Sketch.cmsTable(Seq("c", "a", "b").toDF("k"), "k", d = 4, w = 64)
    val merged = w0.unionByName(w1).groupBy("i", "slot").agg(sum("cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  private def docsDf(ids: Seq[Long]) =
    ids.map(i => (i, s"tok${i} " * (i % 3 + 1).toInt)).toDF("doc_id", "text")

  test("one-batch stream reproduces batch shardAssign exactly") {
    val docs = docsDf(1L to 40L)
    val out = java.nio.file.Files.createTempDirectory("shards_one").toString
    val st = java.nio.file.Files.createTempDirectory("shards_one_st").toString
    StreamShards.shardBatch("doc_id", "text", shardTokens = 13L,
      outDir = out, stateDir = st)(docs, 0L)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "n_tokens", "cum_tokens", "shard_id").orderBy("doc_id")
      .collect().toSeq
    val batch = Mix.shardAssign(docs, "doc_id", "text", shardTokens = 13L)
      .orderBy("doc_id").collect().toSeq
    assert(streamed == batch)
  }

  test("shard ids continue across batches: contiguous token accounting, no reset") {
    val out = java.nio.file.Files.createTempDirectory("shards_cont").toString
    val st = java.nio.file.Files.createTempDirectory("shards_cont_st").toString
    val f = StreamShards.shardBatch("doc_id", "text", shardTokens = 13L, out, st)
    f(docsDf(1L to 20L), 0L)
    f(docsDf(21L to 40L), 1L)
    val got = spark.read.parquet(out)
    // token accounting is one contiguous stream: total cum == total tokens,
    // and batch 2 started exactly at batch 1's end
    val state = StreamShards.readState(st)
    assert(state(1L)._1 == state(0L)._2)
    val totalTokens = got.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(state(1L)._2 == totalTokens)
    // no shard id reset: batch-2 rows start in the shard batch 1 ended in
    val lastShardB1 = state(0L)._2 match { case end => (end - 1) / 13L }
    // partitionBy writes shard_id as a partition column, read back as int
    val minShardB2 = got.filter(col("doc_id") > 20)
      .agg(min(col("shard_id").cast("long"))).collect()(0).getLong(0)
    assert(minShardB2 >= lastShardB1 - 1 && minShardB2 <= lastShardB1 + 1,
      s"batch 2 shards restarted: min=$minShardB2 vs last=$lastShardB1")
  }

  test("replayed batch id is idempotent on the offset state (at-least-once safe)") {
    val out = java.nio.file.Files.createTempDirectory("shards_replay").toString
    val st = java.nio.file.Files.createTempDirectory("shards_replay_st").toString
    val f = StreamShards.shardBatch("doc_id", "text", shardTokens = 13L, out, st)
    f(docsDf(1L to 20L), 0L)
    val after1 = StreamShards.readState(st)
    f(docsDf(1L to 20L), 0L) // foreachBatch replay of the same batch
    assert(StreamShards.readState(st) == after1, "replay advanced the offset")
    // a restart (fresh function instance, same stateDir) resumes correctly
    val g = StreamShards.shardBatch("doc_id", "text", shardTokens = 13L, out, st)
    g(docsDf(21L to 30L), 1L)
    assert(StreamShards.readState(st)(1L)._1 == after1(0L)._2)
  }
}
