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

  test("double order keys rewrite via the IEEE order isomorphism and match the window plan") {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    def q = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(hasTopK(q))
    val got = collectSorted(q)
    spark.conf.set("spark.graft.topk.rewrite", "false")
    val want = try collectSorted(q) finally spark.conf.unset("spark.graft.topk.rewrite")
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("adversarial doubles (NaN, infinities, signed zero, nulls) order exactly like the window") {
    import spark.implicits._
    val specials = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, -Double.MaxValue, 1.5, -1.5)
    val data = specials.zipWithIndex.flatMap { case (v, i) =>
      Seq((0L, java.lang.Double.valueOf(v), i.toLong * 2),
          (1L, if (i % 3 == 0) null.asInstanceOf[java.lang.Double] else java.lang.Double.valueOf(v), i.toLong * 2 + 1))
    }.toDF("k", "score", "id")
    val variants = Seq(col("score").asc, col("score").desc,
      col("score").asc_nulls_last, col("score").desc_nulls_first)
    for (ordCol <- variants; kBound <- Seq(1, 3, 5)) {
      val w = Window.partitionBy("k").orderBy(ordCol, col("id").asc)
      def q = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= kBound)
      assert(hasTopK(q))
      // compare rendered rows: Seq equality would fail on NaN == NaN
      val got = q.collect().map(_.toSeq.toString).sorted
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val want = try q.collect().map(_.toSeq.toString).sorted
                 finally spark.conf.unset("spark.graft.topk.rewrite")
      assert(got.toSeq == want.toSeq, s"double specials diverged for $ordCol k=$kBound")
    }
  }

  test("string order keys rewrite via the binary encoding and match the window plan") {
    // o_orderkey tiebreak makes row_number deterministic across plans
    for (ordCol <- Seq(col("o_orderstatus").asc, col("o_orderstatus").desc)) {
      val w = Window.partitionBy("o_custkey").orderBy(ordCol, col("o_orderkey").asc)
      def q = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      assert(hasTopK(q), s"string key $ordCol should rewrite")
      val got = collectSorted(q)
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val want = try collectSorted(q) finally spark.conf.unset("spark.graft.topk.rewrite")
      assert(got.toSeq == want.toSeq && got.nonEmpty)
    }
  }

  test("string prefix pairs and nulls order exactly (inverted byte encoding)") {
    // "ab" vs "abc" is where truncated/bit-flipped schemes break: the
    // inverted mode must still reverse order exactly, nulls must follow
    // the window's null placement
    val data = Seq((1L, "ab", 1L), (1L, "abc", 2L), (1L, "aa", 3L), (1L, "b", 4L),
      (1L, "", 5L), (1L, null, 6L), (1L, "ab", 7L), (1L, null, 8L),
      (2L, "abc", 9L), (2L, "ab", 10L),
      // multi-byte UTF-8: the byte encoding must order like UTF8String
      (3L, "é", 11L), (3L, "e", 12L), (3L, "aé", 13L), (3L, "a", 14L),
      (3L, "z😀", 15L), (3L, "z", 16L), (3L, "éb", 17L)).toDF("k", "s", "id")
    val variants = Seq(col("s").asc, col("s").desc, col("s").asc_nulls_last, col("s").desc_nulls_first)
    for (ordCol <- variants; kBound <- Seq(1, 2, 3, 5)) {
      val w = Window.partitionBy("k").orderBy(ordCol, col("id").asc)
      def q = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= kBound)
      assert(hasTopK(q), s"$ordCol k=$kBound should rewrite")
      val got = q.collect().map(_.toSeq).sortBy(_.toString)
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val want = try q.collect().map(_.toSeq).sortBy(_.toString)
                 finally spark.conf.unset("spark.graft.topk.rewrite")
      assert(got.toSeq == want.toSeq, s"variant $ordCol k=$kBound diverged")
    }
  }

  test("null rows stay distinguishable from extreme-valued rows at the k boundary") {
    // regression: the old encoding mapped NullsFirst-null to Long.MaxValue,
    // which collides with BitwiseNot(Long.MinValue) under asc — a null row
    // and a Long.MinValue row became an arbitrary tie at the cut
    val data = Seq(
      (1L, java.lang.Long.valueOf(Long.MinValue), 1L),
      (1L, null.asInstanceOf[java.lang.Long], 2L),
      (1L, java.lang.Long.valueOf(Long.MaxValue), 3L),
      (1L, null.asInstanceOf[java.lang.Long], 4L),
      (1L, java.lang.Long.valueOf(0L), 5L)).toDF("k", "ord", "id")
    val variants = Seq(col("ord").asc, col("ord").desc, col("ord").asc_nulls_last,
      col("ord").desc_nulls_first)
    for (ordCol <- variants; kBound <- 1 to 4) {
      val w = Window.partitionBy("k").orderBy(ordCol, col("id").asc)
      def q = data.withColumn("rn", row_number().over(w)).filter(col("rn") <= kBound)
      assert(hasTopK(q))
      val got = q.collect().map(_.toSeq).sortBy(_.toString)
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val want = try q.collect().map(_.toSeq).sortBy(_.toString)
                 finally spark.conf.unset("spark.graft.topk.rewrite")
      assert(got.toSeq == want.toSeq, s"boundary variant $ordCol k=$kBound diverged")
    }
  }

  test("rank() <= k rewrites with keep_ties and retains every tying row") {
    // o_orderdate alone ties heavily within a customer — rank keeps all
    // rows of the cut rank, so the result set is deterministic
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc)
    def q = orders.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    assert(hasTopK(q), q.queryExecution.optimizedPlan.toString)
    val got = collectSorted(q)
    spark.conf.set("spark.graft.topk.rewrite", "false")
    val want = try {
      val d = q
      assert(!hasTopK(d))
      collectSorted(d)
    } finally spark.conf.unset("spark.graft.topk.rewrite")
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("rank ties at the boundary survive across partial-merge paths") {
    // many copies of the boundary key per partition so map-side partials
    // carry tie lists through merge
    val data = Seq.tabulate(4000) { i =>
      (i % 7L, (i % 5).toLong, i.toLong)
    }.toDF("k", "ord", "id").repartition(8)
    for (kBound <- Seq(1, 2, 3)) {
      val w = Window.partitionBy("k").orderBy(col("ord").desc)
      def q = data.withColumn("rn", rank().over(w)).filter(col("rn") <= kBound)
      assert(hasTopK(q))
      val got = q.collect().map(_.toSeq).sortBy(_.toString)
      spark.conf.set("spark.graft.topk.rewrite", "false")
      val want = try q.collect().map(_.toSeq).sortBy(_.toString)
                 finally spark.conf.unset("spark.graft.topk.rewrite")
      assert(got.toSeq == want.toSeq, s"rank ties k=$kBound diverged")
      assert(got.size >= kBound, "tie groups must widen the result")
    }
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

  test("dense_rank()/large k are left alone") {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").desc)
    // dense_rank over k distinct VALUES can cover unbounded rows — not
    // expressible as a k-bounded heap
    val denseRanked = orders.withColumn("rn", dense_rank().over(w)).filter(col("rn") <= 2)
    assert(!hasTopK(denseRanked))
    val bigK = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 100000)
    assert(!hasTopK(bigK))
  }
}
