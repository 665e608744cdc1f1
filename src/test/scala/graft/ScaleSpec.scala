package graft

import graft.operators.Scale
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns the same rows as a plain join") {
    val left = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k$i", i)).toDF("k", "v")
    val right = Seq(("hot", "H"), ("k1", "A"), ("k7", "B")).toDF("k", "name")
    val plain = left.join(right, "k").select("k", "v", "name").collect().toSet
    val salted = Scale.saltedJoin(left, right, "k", salts = 8).select("k", "v", "name").collect().toSet
    assert(salted == plain && plain.size == 102)
  }

  test("globalRowNumber equals the single-partition window, distributed") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq.tabulate(5000)(i => (i * 37 % 5000, s"v$i")).toDF("k", "v")
      .repartition(16) // scrambled input partitions
    val got = Scale.globalRowNumber(df, Seq("k"), partitions = 8)
      .select("k", "row_idx").as[(Int, Long)].collect().sortBy(_._1)
    val want = df.withColumn("row_idx", row_number().over(Window.orderBy("k")).cast("long"))
      .select("k", "row_idx").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // no single-partition window: every physical partition holds rows
    val parts = Scale.globalRowNumber(df, Seq("k"), partitions = 8)
      .select("row_idx").rdd.getNumPartitions
    assert(parts == 8)
    graft.operators.Caches.release()
  }

  test("bucketed tables join without a shuffle exchange") {
    // the metastore is per-JVM but warehouse files persist: clear both
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        java.nio.file.Files.walk(loc.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    val a = Seq.tabulate(100)(i => (i.toLong, s"a$i")).toDF("id", "a")
    val b = Seq.tabulate(100)(i => (i.toLong, s"b$i")).toDF("id", "b")
    Scale.writeBucketed(a, "bkt_a", "id", buckets = 4)
    Scale.writeBucketed(b, "bkt_b", "id", buckets = 4)

    val joined = Scale.bucketedJoin(spark, "bkt_a", "bkt_b", "id")
    assert(joined.count() == 100)
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"expected exchange-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
  }
}
