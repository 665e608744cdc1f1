package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r12 optimization round): piecewise stage timing for the
  * expensive registry entries — `runMain graft.OptProbe <probe> [sfDir]`.
  * Each probe times named sub-chains of one query cold (operator caches
  * released between pieces) so the expensive stage is identified by
  * measurement, not guesswork (guide §1).
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "lsh"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.autoSizeShuffle(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    which match {
      case "lsh" =>
        t("prefixPairs(1,2)") {
          graft.operators.Dedup.prefixFilterPairs(docs, "doc_id", "text", 1, 2).count()
        }
        graft.operators.Caches.release()
        val bands = 12; val r = 2
        val sig = docs
          .select(col("doc_id").as("id"), graft.functions.TextFunctions.wordSet(col("text")).as("ws"))
          .filter(size(col("ws")) > 0)
          .select(col("id"), transform(sequence(lit(0), lit(bands * r - 1)), i =>
            array_min(transform(col("ws"), w =>
              graft.plans.NativeHash.md5Mod(
                concat(lit("mh"), i.cast("string"), lit(":"), w), 2147483648L)))).as("sig"))
        t("signature only") { sig.count() }
        val bucketed = sig
          .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("b"), col("sig"))
          .select(col("id"), col("b"),
            element_at(col("sig"), col("b") * 2 + 1).as("v0"),
            element_at(col("sig"), col("b") * 2 + 2).as("v1"))
        val cand = bucketed.as("x").join(bucketed.as("y"),
            col("x.b") === col("y.b") && col("x.v0") === col("y.v0") &&
              col("x.v1") === col("y.v1") && col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct()
        t("sig+bucket+cand") { cand.count() }
        graft.operators.Caches.release()
        t("full q_lsh_tuning cold") { graft.queries.LlmQueries.qLshTuning(spark, dir).count() }
      case "prefix" =>
        // stages of Dedup.prefixRepPairs at tNum/tDen = 1/2 (the q_lsh_tuning
        // generator) — where do the 55 s go?
        val (tNum, tDen) = (1, 2)
        val units: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          graft.functions.TextFunctions.wordSet
        val keyed = docs.select(col("doc_id").as("id"),
          md5(array_join(sort_array(units(col("text"))), " ")).as("set_key")).persist()
        t("keyed") { keyed.count() }
        val groups = keyed.groupBy("set_key")
          .agg(min(col("id")).as("gmin"))
          .join(docs.select(col("doc_id").as("gmin"), col("text").as("__text")), "gmin")
          .select(col("set_key"), sort_array(units(col("__text"))).as("words"))
          .persist()
        t("groups (distinct sets)") { groups.count() }
        val tokDf = groups.select(explode(col("words")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("df"))
        val ordered = groups.select(col("set_key"), explode(col("words")).as("w"))
          .join(tokDf, "w")
          .groupBy("set_key")
          .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("ow"))
          .select(col("set_key"), transform(col("ow"), s => s.getField("w")).as("ow"))
        val pref = ordered
          .withColumn("sz", size(col("ow")))
          .withColumn("p",
            (col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) DIV $tDen") + 1).cast("int"))
          .select(col("set_key"), col("sz"),
            posexplode(slice(col("ow"), lit(1), col("p"))).as(Seq("pos", "w")))
        t("pref rows") { pref.count() }
        val alphaDen = (tNum + tDen).toLong
        val candRaw = pref.as("a").join(pref.as("b"),
          col("a.w") === col("b.w") &&
            col("a.set_key") < col("b.set_key") &&
            lit(tDen.toLong) * least(col("a.sz"), col("b.sz")) >=
              lit(tNum.toLong) * greatest(col("a.sz"), col("b.sz")) &&
            (lit(1L) + least(col("a.sz") - 1 - col("a.pos"), col("b.sz") - 1 - col("b.pos"))) *
              lit(alphaDen) >= lit(tNum.toLong) * (col("a.sz") + col("b.sz")))
          .select(col("a.set_key").as("id_a"), col("b.set_key").as("id_b"))
        t("cand raw (pre-distinct)") { candRaw.count() }
        val cand = candRaw.distinct()
        t("cand distinct") { cand.count() }
        val threshold = tNum.toDouble / tDen
        val repPairs = cand
          .join(groups.select(col("set_key").as("id_a"), col("words").as("words_a")), "id_a")
          .join(groups.select(col("set_key").as("id_b"), col("words").as("words_b")), "id_b")
          .withColumn("__i",
            graft.plans.NativeHash.sortedIntersectGe(col("words_a"), col("words_b"), threshold))
          .filter(col("__i") >= 0)
          .withColumn("jaccard",
            col("__i").cast("double") /
              (size(col("words_a")) + size(col("words_b")) - col("__i")).cast("double"))
          .select("id_a", "id_b", "jaccard")
        t("repPairs (verify)") { repPairs.count() }
        val cross = repPairs
          .join(keyed.select(col("set_key").as("id_a"), col("id").as("ia")), "id_a")
          .join(keyed.select(col("set_key").as("id_b"), col("id").as("ib")), "id_b")
          .select(least(col("ia"), col("ib")).as("id_a"),
            greatest(col("ia"), col("ib")).as("id_b"), col("jaccard"))
        t("doc-pair expansion") { cross.count() }
      case "ssjwarm" =>
        // q_set_sim_join chain at 4/5, three timed passes WITHOUT cache
        // release (the bench warm regime), then the substrate pieces warm
        for (i <- 1 to 3)
          t(s"prefixFilterPairs(4,5) #$i") {
            graft.operators.Dedup.prefixFilterPairs(docs, "doc_id", "text", 4, 5).count()
          }
        val sub = graft.operators.Dedup.prefixSub(docs, "doc_id", "text", 4, 5)
        t("repPairs warm") { sub.repPairs.count() }
        t("keyed warm") { sub.keyed.count() }
        val cross = sub.repPairs
          .join(sub.keyed.select(col("g").as("id_a"), col("id").as("ia")), "id_a")
          .join(sub.keyed.select(col("g").as("id_b"), col("id").as("ib")), "id_b")
          .select(least(col("ia"), col("ib")).as("id_a"),
            greatest(col("ia"), col("ib")).as("id_b"), col("jaccard"))
        t("cross warm") { cross.count() }
        val intra = sub.keyed.as("a")
          .join(sub.keyed.as("b"), col("a.g") === col("b.g") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"), lit(1.0).as("jaccard"))
        t("intra warm") { intra.count() }
      case "brute" =>
        // brute all-pairs verify over DISTINCT sets vs the prefix join, at
        // t=1/2 and t=4/5 — the route-crossover measurement
        val units: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          graft.functions.TextFunctions.wordSet
        val keyedMd5 = docs.select(col("doc_id").as("id"),
          md5(array_join(sort_array(units(col("text"))), " ")).as("set_key")).persist()
        val skelMd5 = keyedMd5.groupBy("set_key")
          .agg(min(col("id")).as("g"), count(lit(1)).as("n")).persist()
        val groups = skelMd5.select(col("g"))
          .join(docs.select(col("doc_id").as("g"), col("text").as("__text")), "g")
          .select(col("g"), sort_array(units(col("__text"))).as("words"))
          .repartition(col("g"))
          .persist()
        t("groups build") { groups.count() }
        for ((tN, tD) <- Seq((1, 2), (4, 5)); rep <- 1 to 2) {
          val thr = tN.toDouble / tD
          val a = groups.select(col("g").as("ga"), col("words").as("wa"), size(col("words")).as("sa"))
            .repartition(spark.sparkContext.defaultParallelism)
          val b = groups.select(col("g").as("gb"), col("words").as("wb"), size(col("words")).as("sb"))
          val brute = a.join(broadcast(b),
              col("ga") < col("gb") &&
                lit(tD.toLong) * least(col("sa"), col("sb")) >=
                  lit(tN.toLong) * greatest(col("sa"), col("sb")))
            .withColumn("__i", graft.plans.NativeHash.sortedIntersectGe(col("wa"), col("wb"), thr))
            .filter(col("__i") >= 0)
          t(s"brute verify $tN/$tD #$rep") { brute.count() }
        }
      case "graph" =>
        val edges = spark.read.parquet(s"$dir/orders.parquet")
          .join(spark.read.parquet(s"$dir/lineitem.parquet"),
            col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("c"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("ss"))
          .distinct().persist()
        t("edges") { edges.count() }
        val sym = edges.select(col("c").as("src"), col("ss").as("dst"))
          .union(edges.select(col("ss").as("src"), col("c").as("dst")))
        t("pageRank 3") { graft.operators.Graph.pageRank(sym, "src", "dst", 3).count() }
        graft.operators.Caches.release()
        t("ppr 3") { graft.operators.Graph.personalizedPageRank(sym, "src", "dst",
          Seq("c1", "c2", "c3", "c4", "c5"), 3).count() }
        graft.operators.Caches.release()
        t("ppr 3 filter>0") { graft.operators.Graph.personalizedPageRank(sym, "src", "dst",
          Seq("c1", "c2", "c3", "c4", "c5"), 3).filter(col("rank") > 0).count() }
        graft.operators.Caches.release()
        t("qPpr full (edges cached)") {
          graft.queries.AnalyticsQueries.qPersonalizedPagerank(spark, dir).count() }
        graft.operators.Caches.release()
        edges.unpersist(true)
        t("qPpr full cold") {
          graft.queries.AnalyticsQueries.qPersonalizedPagerank(spark, dir).count() }
        graft.operators.Caches.release()
        t("qPageRank full cold") {
          graft.queries.AnalyticsQueries.qPageRank(spark, dir).count() }
      case "simhash" =>
        val cand = graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
        t("simhashPairs") { cand.count() }
        graft.operators.Caches.release()
        val truth = graft.operators.Dedup.prefixFilterPairs(docs, "doc_id", "text", 4, 5)
        t("truth pairs") { truth.count() }
        graft.operators.Caches.release()
        t("full q_simhash_eval") {
          graft.queries.LlmQueries.qSimhashEval(spark, dir).count()
        }
      case "ssjstages" =>
        // warm per-stage timing of the NEW prefixSub chain at 4/5
        val (tN, tD) = (4, 5)
        graft.operators.Dedup.prefixFilterPairs(docs, "doc_id", "text", tN, tD).count()
        val units: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          graft.functions.TextFunctions.wordSet
        val keyedMd5 = docs.select(col("doc_id").as("id"),
          md5(array_join(sort_array(units(col("text"))), " ")).as("set_key")).persist()
        val skelMd5 = keyedMd5.groupBy("set_key")
          .agg(min(col("id")).as("g"), count(lit(1)).as("n")).persist()
        val groups = skelMd5.select(col("g"))
          .join(docs.select(col("doc_id").as("g"), col("text").as("__text")), "g")
          .select(col("g"), sort_array(units(col("__text"))).as("words")).persist()
        t("groups warm") { groups.count() }
        val tokDf = groups.select(explode(col("words")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("df"))
        t("tokDf warm") { tokDf.count() }
        val ordered = groups.select(col("g"), explode(col("words")).as("w"))
          .join(tokDf, "w")
          .groupBy("g")
          .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("ow"))
          .select(col("g"), transform(col("ow"), s => s.getField("w")).as("ow"))
        t("ordered warm") { ordered.count() }
        val pref = ordered
          .withColumn("sz", size(col("ow")))
          .withColumn("p",
            (col("sz") - expr(s"(sz * $tN + ${tD - 1}) DIV $tD") + 1).cast("int"))
          .select(col("g"), col("sz"),
            posexplode(slice(col("ow"), lit(1), col("p"))).as(Seq("pos", "w")))
        t("pref warm") { pref.count() }
        val alphaDen = (tN + tD).toLong
        val candRaw = pref.as("a").join(pref.as("b"),
          col("a.w") === col("b.w") && col("a.g") < col("b.g") &&
            lit(tD.toLong) * least(col("a.sz"), col("b.sz")) >=
              lit(tN.toLong) * greatest(col("a.sz"), col("b.sz")) &&
            (lit(1L) + least(col("a.sz") - 1 - col("a.pos"), col("b.sz") - 1 - col("b.pos"))) *
              lit(alphaDen) >= lit(tN.toLong) * (col("a.sz") + col("b.sz")))
          .select(col("a.g").as("id_a"), col("b.g").as("id_b"))
        t("candRaw warm") { candRaw.count() }
        val cand = candRaw.distinct()
        t("cand distinct warm") { cand.count() }
        val thr = tN.toDouble / tD
        val rp = cand
          .join(groups.select(col("g").as("id_a"), col("words").as("words_a")), "id_a")
          .join(groups.select(col("g").as("id_b"), col("words").as("words_b")), "id_b")
          .withColumn("__i", graft.plans.NativeHash.sortedIntersectGe(col("words_a"), col("words_b"), thr))
          .filter(col("__i") >= 0)
          .select("id_a", "id_b")
        t("verify warm") { rp.count() }
        println("==== executed verify plan ====")
        println(rp.queryExecution.executedPlan.toString.take(12000))
      case _ =>
        sys.error(s"unknown probe: $which")
    }
    spark.stop()
  }
}
