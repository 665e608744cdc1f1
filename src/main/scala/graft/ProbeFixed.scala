package graft
import org.apache.spark.sql.functions._
object ProbeFixed {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.1", "/root/repo/testdata-sf1")) {
      val idx = spark.read.parquet(BenchFixtures.nearDupIndexDir(spark, sf))
      // fixed ~1250-doc batch at BOTH scales: replica-4 docs (ids ≡ 4 mod 40)
      // at sf1, the sf0.1 %4==0 batch at sf0.1 — same shape, disjoint from
      // the index's %4=!=0 corpus at both
      val batch =
        if (sf.endsWith("sf1")) spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") % 40 === 4)
        else spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") % 4 === 0)
      println(s"[probe-fixed] $sf batch=${batch.count()} index=${idx.count()}")
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.operators.Dedup.probeSurvivors(idx, batch, "doc_id", "text", 0.8).count()
        graft.operators.Caches.release()
        println(f"[probe-fixed] $sf run$i: ${(System.nanoTime()-t0)/1e9}%.2f s, survivors=$n")
      }
    }
    spark.stop()
  }
}
