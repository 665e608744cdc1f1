package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKRewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  private def orders = spark.read.parquet(s"$sfDir/orders.parquet")

  private def windowTopN(k: Int): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def hasTopK(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("graft_topk")

  private def collectSorted(df: DataFrame) =
    df.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "rn")
      .collect().map(_.toSeq).sortBy(_.toString)

  test("rewrite fires on row_number<=k and matches the window plan row for row") {
    val rewritten = windowTopN(3)
    assert(hasTopK(rewritten), rewritten.queryExecution.optimizedPlan.toString)
    val disabled = {
      spark.conf.set("spark.graft.topk.rewrite", "false")
      try {
        val d = windowTopN(3)
        assert(!hasTopK(d))
        collectSorted(d)
      } finally spark.conf.unset("spark.graft.topk.rewrite")
    }
    assert(collectSorted(rewritten).toSeq == disabled.toSeq)
  }

  test("rn = 1, residual conjuncts, and ascending order all preserved") {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    def q = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("o_totalprice") > 1000.0)
    assert(hasTopK(q))
    val got = collectSorted(q)
    spark.conf.set("spark.graft.topk.rewrite", "false")
    val want = try collectSorted(q) finally spark.conf.unset("spark.graft.topk.rewrite")
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("global top-k (no partition) rewrites to a grouping-free aggregate") {
    val w = Window.orderBy(col("o_totalprice").desc.cast("int").isNotNull, col("o_orderkey").asc)
    // o_totalprice is double (not encodable) -> use integral keys only
    val wInt = Window.orderBy(col("o_orderkey").asc)
    def q = orders.withColumn("rn", row_number().over(wInt)).filter(col("rn") <= 5)
    assert(hasTopK(q))
    val got = q.select("o_orderkey", "rn").as[(Long, Int)].collect().sortBy(_._2)
    spark.conf.set("spark.graft.topk.rewrite", "false")
    val want = try q.select("o_orderkey", "rn").as[(Long, Int)].collect().sortBy(_._2)
               finally spark.conf.unset("spark.graft.topk.rewrite")
    assert(got.toSeq == want.toSeq && got.size == 5)
  }

  test("non-encodable order keys (string/double) do NOT rewrite") {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val q = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(!hasTopK(q))
    val w2 = Window.partitionBy("o_custkey").orderBy(col("o_orderstatus").asc)
    val q2 = orders.withColumn("rn", row_number().over(w2)).filter(col("rn") <= 2)
    assert(!hasTopK(q2))
  }

  test("randomized: rewrite matches the window plan across k/direction/null-ordering") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // keys with heavy groups + nullable order column
    val data = Seq.tabulate(3000) { i =>
      (i % 37L, if (i % 11 == 0) null.asInstanceOf[java.lang.Long] else java.lang.Long.valueOf((i * 131) % 500),
        i.toLong)
    }.toDF("k", "ord", "id")
    val sortVariants: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      ("asc",              col("ord").asc),
      ("desc",             col("ord").desc),
      ("asc_nulls_last",   col("ord").asc_nulls_last),
      ("desc_nulls_first", col("ord").desc_nulls_first))
    for ((name, ordCol) <- sortVariants; kBound <- Seq(1, 3, 7)) {
      val w = Window.partitionBy("k").orderBy(ordCol, col("id").asc)
      def q = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= kBound)
      assert(hasTopK(q), s"$name k=$kBound should rewrite")
      val got = q.collect().map(_.toSeq).sortBy(_.toString)
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val want = try q.collect().map(_.toSeq).sortBy(_.toString)
                 finally spark.conf.unset("spark.graft.topk.rewrite")
      assert(got.toSeq == want.toSeq, s"variant $name k=$kBound diverged")
    }
  }

  test("rank()/large k/non-literal bounds are left alone") {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").desc)
    val ranked = orders.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    assert(!hasTopK(ranked))
    val bigK = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 100000)
    assert(!hasTopK(bigK))
  }
}
