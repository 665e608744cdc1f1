package graft

import graft.operators.Sketch
import graft.streaming.StreamStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming HLL: per-window registers settle to exactly the batch sketch of
  * the same rows — across micro-batch boundaries, duplicates, and
  * out-of-order arrivals inside the watermark.
  */
class StreamStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  // two 10-minute windows; duplicates in both; an out-of-order arrival in a
  // later micro-batch that still lands inside the first window
  private val batch1 = Seq(
    (ts(1), "u1"), (ts(2), "u2"), (ts(3), "u1"),
    (ts(11), "u1"), (ts(12), "u9"))
  private val batch2 = Seq(
    (ts(4), "u3"), (ts(2), "u2"),  // out-of-order, window 0
    (ts(13), "u9"), (ts(14), "u4"))

  private def expected = {
    val all = (batch1 ++ batch2).toDF("ts", "k")
    val (bucket, rho) = Sketch.hllProjection(col("k"))
    all.select(window(col("ts"), "10 minutes").as("window"),
        bucket.as("bucket"), rho.as("rho"))
      .groupBy("window", "bucket").agg(max("rho").as("rho"))
      .select(col("window.start").cast("long").as("ws"), col("bucket"), col("rho"))
      .orderBy("ws", "bucket")
      .collect().toSeq
  }

  test("windowed streaming registers == batch sketch of the same rows") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val regs = StreamStats.hllRegistersWindowed(
      in.toDF().toDF("ts", "k"), "ts", "k", "10 minutes", "30 minutes")
    val q = regs.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("hll_stream")
        .select(col("window.start").cast("long").as("ws"), col("bucket"), col("rho"))
        .orderBy("ws", "bucket").collect().toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("update-mode emissions fold by max to the same settled registers") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val regs = StreamStats.hllRegistersWindowed(
      in.toDF().toDF("ts", "k"), "ts", "k", "10 minutes", "30 minutes")
    val q = regs.writeStream.format("memory").queryName("hll_updates")
      .outputMode("update").start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      // update mode re-emits a (window, bucket) row whenever its max moves;
      // max-folding the emission log reconstructs the settled registers —
      // the idempotence that makes the sketch safe under replays
      val got = spark.table("hll_updates")
        .groupBy(col("window.start").cast("long").as("ws"), col("bucket"))
        .agg(max("rho").as("rho"))
        .orderBy("ws", "bucket").collect().toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("windowed streaming quantile sketch == batch Hdr sketch of the same rows") {
    implicit val sq = spark.sqlContext
    import graft.operators.Hdr
    val vb1 = Seq((ts(1), 10L), (ts(2), 500L), (ts(3), 12L), (ts(11), 99999L))
    val vb2 = Seq((ts(4), 7L), (ts(2), 500L), (ts(13), 1L << 30), (ts(14), 31L))
    val in = MemoryStream[(Timestamp, Long)]
    val sk = StreamStats.hdrSketchWindowed(
      in.toDF().toDF("ts", "v"), "ts", "v", "10 minutes", "30 minutes")
    val q = sk.writeStream.format("memory").queryName("hdr_stream")
      .outputMode("complete").start()
    try {
      in.addData(vb1: _*); q.processAllAvailable()
      in.addData(vb2: _*); q.processAllAvailable()
      val got = spark.table("hdr_stream")
        .select(col("window.start").cast("long").as("ws"), col("bucket"), col("cnt"))
        .orderBy("ws", "bucket").collect().toSeq
      val want = (vb1 ++ vb2).toDF("ts", "v")
        .select(window(col("ts"), "10 minutes").as("window"),
          Hdr.bucketOf(col("v"), 5).as("bucket"))
        .groupBy("window", "bucket").agg(count(lit(1)).as("cnt"))
        .select(col("window.start").cast("long").as("ws"), col("bucket"), col("cnt"))
        .orderBy("ws", "bucket").collect().toSeq
      assert(got == want)
      assert(got.nonEmpty)
      // window tables feed the same downstream algebra as batch sketches
      val merged = Hdr.mergeBy(
        spark.table("hdr_stream").select(lit("all").as("k"), col("bucket"), col("cnt")),
        spark.table("hdr_stream").limit(0).select(lit("all").as("k"), col("bucket"), col("cnt")),
        Seq("k"))
      val rebuilt = Hdr.sketchBy(
        (vb1 ++ vb2).toDF("ts", "v").select(lit("all").as("k"), col("v")), Seq("k"), "v", 5)
      assert(merged.collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq ==
        rebuilt.collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq)
    } finally q.stop()
  }

  test("estimate over merged window tables == estimate over the union") {
    val a = Sketch.hllRegisters((1 to 3000).map(i => s"a$i").toDF("v"), "v")
    val b = Sketch.hllRegisters((1 to 2000).map(i => s"b$i").toDF("v"), "v")
    val est = Sketch.hllEstimate(Sketch.hllMerge(a, b))
    assert(math.abs(est - 5000) / 5000.0 < 0.05, s"est=$est")
  }
}
