package graft

import graft.queries.{AnalyticsQueries, SourceQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan contracts: the scale-critical physical-plan properties (SURVEY.md
  * §4, PLANS.md) asserted so refactors can't silently regress them.
  */
class PlanContractSpec extends SparkSpec {

  private def executed(df: DataFrame) = df.queryExecution.executedPlan

  private def planString(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q1: shipdate filter reaches the parquet scan; minimal read schema") {
    val p = planString(graft.queries.CoreQueries.q1PricingSummary(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "column pruning lost: reads unneeded columns")
  }

  test("q6: fully pushed predicates; only the single-partition partial-agg exchange") {
    val df = AnalyticsQueries.q6ForecastRevenue(spark, sfDir)
    val p = planString(df)
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)") && p.contains("LessThan(l_quantity,24.0)"))
    df.collect() // materialize under AQE before inspecting the final plan
    val s = executed(df).toString
    // the only exchange allowed is the SinglePartition gather of per-task
    // partial aggregates (a handful of rows), never a data-sized shuffle
    val exchanges = s.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("SinglePartition")), s"unexpected exchanges:\n${exchanges.mkString("\n")}")
  }

  test("q5: all five dimension joins broadcast; fact side never pre-shuffles") {
    val df = AnalyticsQueries.q5LocalSupplier(spark, sfDir)
    df.collect()
    val s = executed(df).toString
    val broadcasts = s.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 5, s"expected >=5 broadcast joins, got $broadcasts")
  }

  test("multisource merge: sub-source joins stay broadcast") {
    val df = SourceQueries.qMultisourceMerge(spark, sfDir)
    df.collect()
    assert(executed(df).toString.contains("BroadcastHashJoin"))
  }

  test("q_window_topn auto-rewrites to the bounded graft_topk aggregate") {
    val df = AnalyticsQueries.qWindowTopn(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_topk"), s"TopKRewriteRule did not fire:\n$opt")
    assert(!opt.contains("row_number"), "window formulation survived the rewrite")
  }

  test("ann lsh: bucket join is an equi hash join, not a nested loop") {
    val df = graft.queries.LlmQueries.qAnnLsh(spark, sfDir)
    df.collect()
    val s = executed(df).toString
    assert(s.contains("BroadcastHashJoin") && !s.contains("BroadcastNestedLoopJoin"))
  }

  test("minhash near-dup: candidate scan carries no word arrays; verify joins are hash joins") {
    val df = graft.queries.LlmQueries.qDedupMinhash(spark, sfDir)
    df.collect()
    val s = executed(df).toString
    // the O(n²) pair scan probes (size, sig) only — words join back later
    val bnlj = s.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).mkString
    assert(!bnlj.contains("words"), s"word arrays must not ride the pair scan:\n$bnlj")
    assert(s.contains("BroadcastHashJoin"))
    graft.operators.Caches.release()
  }

  test("seq packing: one shuffle (the stratum×shard window), no global window") {
    val df = graft.queries.LlmQueries.qSeqPack(spark, sfDir)
    df.collect()
    val s = executed(df).toString
    // window partitioned by (lang, shard): never a single-partition window
    assert(s.contains("Window"))
    assert(!s.contains("SinglePartition) hashpartitioning") &&
      !s.linesIterator.exists(l => l.contains("Window") && l.contains("SinglePartition")))
  }

  test("incremental probe (broadcast route): one streamed index scan, no sort-merge join") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val idx = graft.operators.Dedup
      .buildNearDupIndex(docs.filter(col("doc_id") % 4 =!= 0), "doc_id", "text").persist()
    idx.count()
    try {
      val out = graft.operators.Dedup
        .probeSurvivors(idx, docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", 0.8)
      out.collect()
      // AQE prints Final AND Initial plans — count nodes in the final only
      val s = executed(out).toString.split("== Initial Plan ==").head
      // candidate+verify runs as the condition-inline broadcast join: each
      // (index row × batch rep) pair tested once, index streamed not shuffled
      assert(s.contains("BroadcastNestedLoopJoin"), s"condition-inline probe missing:\n$s")
      assert(!s.contains("SortMergeJoin"), "probe shuffled a side it should broadcast")
      // the index is read ONCE linearly into the repartitioned slim cache
      // (the r8 fix: the nested loop runs where the stream partitions are,
      // and a one-file index otherwise pins the whole quadratic loop to one
      // core), and the LOOP streams only that cache: ≤ 2 bks-bearing scans,
      // and the loop's input must be the repartitioned copy
      val idxScans = s.linesIterator.count(l =>
        l.contains("InMemoryTableScan") && "[\\[, ]bks#".r.findFirstIn(l).isDefined)
      assert(idxScans <= 2, s"expected ≤2 index scans (linear repartition read + loop stream), got $idxScans:\n$s")
      assert(s.contains("REPARTITION_BY_NUM"), s"probe stream not width-repartitioned:\n$s")
    } finally { idx.unpersist(); graft.operators.Caches.release() }
  }

  test("near-dup verify runs the early-exit intersect, not a two-scan chain") {
    // minhash family: the single-scan -1-or-exact-count expression carries
    // both the threshold verdict and the output jaccard's intersect size
    val pairs = planString(graft.queries.LlmQueries.qDedupMinhash(spark, sfDir))
    assert(pairs.contains("graft_sorted_isect_ge"),
      s"single-scan threshold intersect missing from minhash verify:\n$pairs")
    assert(!pairs.contains("graft_sorted_isect("),
      "full-intersect rescan leaked back into the verify path")
    // incremental probe: verdict-only → the boolean early-exit form
    val probe = planString(graft.queries.LlmQueries.qDedupIncremental(spark, sfDir))
    assert(probe.contains("graft_jaccard_ge"),
      s"early-exit verdict missing from probe verify:\n$probe")
    graft.operators.Caches.release()
  }

  test("tfidf: final per-doc window rewrites to the graft_topk heap; df joins without corpus re-shuffle") {
    val df = graft.queries.LlmQueries.qTfidfTopk(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    // the rank()<=k window is rewrite-eligible: map tasks ship at most k
    // (doc, term) rows per doc instead of sorting whole documents
    assert(opt.contains("graft_topk"), s"TopKRewriteRule did not fire on the tf-idf window:\n$opt")
    assert(!opt.contains("row_number"), "window formulation survived the rewrite")
    df.collect()
    val s = executed(df).toString.split("== Initial Plan ==").head
    // df-join strategy pinned: the tf↔df join stays KEYED on term (hash
    // join at bench SFs; sort-merge is the acceptable fallback when the
    // vocabulary outgrows the broadcast threshold). The corpus-count
    // crossJoin is exempt — broadcasting ONE row as a nested loop is the
    // intended plan for it.
    assert(s.linesIterator.exists(l => l.contains("BroadcastHashJoin [term")),
      s"term df join-back should hash-join at bench SFs:\n$s")
    val badNlj = s.linesIterator.filter(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("term")).toSeq
    assert(badNlj.isEmpty, s"term join degenerated to a nested loop:\n${badNlj.mkString("\n")}")
  }

  test("curation v2: cap heap-rewrites inside the composition; benchmark shingles broadcast") {
    val df = graft.queries.LlmQueries.qCurationPipelineV2(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_topk"),
      s"domain-cap window must heap-rewrite inside the composed pipeline:\n$opt")
    df.collect()
    val s = executed(df).toString.split("== Initial Plan ==").head
    // decontamination probes a broadcast benchmark shingle set — the
    // corpus-sized survivor stream must never shuffle for that join
    assert(s.contains("BroadcastHashJoin"), s"benchmark shingle join should broadcast:\n$s")
    graft.operators.Caches.release()
  }

  test("ivf assignment: k=1 heap rewrite fires and the ×nlist stream ships no embeddings") {
    val df = graft.queries.LlmQueries.qAnnIvf(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    // row_number()===1 over (vid) must rewrite to the bounded heap — one
    // row per vector leaves each map task instead of nlist sorted rows
    assert(opt.contains("graft_topk"),
      s"TopKRewriteRule did not fire on assignToNearest:\n$opt")
    df.collect()
    val s = executed(df).toString.split("== Initial Plan ==").head
    // the scored ×nlist projection is slim: (vid, cid, d) with the vector
    // payload dropped map-side before any exchange
    val slimProj = s.linesIterator.exists(l =>
      l.contains("Project [") && "[\\[, ]d#".r.findFirstIn(l).isDefined &&
        "[\\[, ]cid#".r.findFirstIn(l).isDefined &&
        "[\\[, ]v#".r.findFirstIn(l).isEmpty)
    assert(slimProj, s"×nlist stream still carries the embedding column:\n$s")
    graft.operators.Caches.release()
  }

  test("fluency default: zero wide shuffles — counts broadcast, occurrences never exchange") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Fluency.bigramFluency(docs, "doc_id", "text")
    df.collect()
    val s = executed(df).toString.split("== Initial Plan ==").head
    // the measured-fast default: c2/c1 ride broadcasts, so the persisted
    // occurrence stream feeds map-side hash joins and never shuffles for
    // a join (the remaining exchanges are the slim count partials and the
    // final per-doc aggregation)
    assert(!s.contains("SortMergeJoin"),
      s"count joins stopped broadcasting at bench SF:\n$s")
    // the cache BUILD subtree (InMemoryRelation → its FileScan) is
    // shuffle-free: scan → filter → explode → project, no Exchange
    val build = s.split("InMemoryRelation")(1).split("FileScan")(0)
    assert(!build.contains("Exchange"),
      s"occurrence cache build gained a shuffle:\n$s")
    graft.operators.Caches.release()
  }

  test("fluency preAggregate: count joins probe the per-(doc,bigram) aggregate, never raw occurrences") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Fluency.bigramFluency(docs, "doc_id", "text",
      preAggregate = true)
    df.collect()
    val s = executed(df).toString.split("== Initial Plan ==").head
    // the probe side of the c2/c1 joins must be the reduced (doc, w1, w2, k)
    // frame: the persisted aggregate appears as an InMemoryTableScan
    // carrying the multiplicity column k — if the joins consumed the raw
    // occurrence explode, no k attribute would exist on the probe side
    val probeScans = s.linesIterator.count(l =>
      l.contains("InMemoryTableScan") && "[\\[, ]k#".r.findFirstIn(l).isDefined)
    assert(probeScans >= 1,
      s"c2/c1 joins no longer probe the pre-aggregated bigram frame:\n$s")
    // occurrence stream reduced before joining: the explode exists ONLY
    // inside the cache-build subtree (printed under InMemoryRelation) —
    // exactly one occurrence means no join consumes raw generator output
    val explodes = "Generate explode".r.findAllIn(s).size
    assert(explodes == 1,
      s"expected the explode only in the cache build, found $explodes:\n$s")
    graft.operators.Caches.release()
  }

  test("prefix-filter join: the at-scale route's candidate stage is an equi join, never a nested loop") {
    // r12 planner split: below bruteThreshold distinct sets the substrate
    // takes a BROADCAST all-pairs scan (a deliberate BroadcastNestedLoopJoin
    // over the slim size-pruned frame — never an unbroadcast cartesian);
    // the contract here pins the AT-SCALE route (bruteThreshold = 0): its
    // candidate generation must stay an equi join on the prefix token.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sub = graft.operators.Dedup.prefixSub(docs, "doc_id", "text", 4, 5,
      bruteThreshold = 0L)
    val df = sub.repPairs
    df.collect()
    val s = executed(df).toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"prefix candidate generation degraded to a product join:\n$s")
    graft.operators.Caches.release()
    // and the registered query's small-corpus brute route must broadcast —
    // an unbroadcast cartesian would be the real scale bug
    val dfq = graft.queries.LlmQueries.qSetSimJoin(spark, sfDir)
    dfq.collect()
    val sq = executed(dfq).toString
    assert(!sq.contains("CartesianProduct"),
      s"brute route ran an unbroadcast cartesian product:\n$sq")
    graft.operators.Caches.release()
  }

  test("two-level running aggregates never run an unpartitioned window") {
    // skyline + concurrency + pareto ride Scale.strictPrefixMax/runningSum;
    // a global ORDER BY window (empty PARTITION BY) would move every row
    // to one task — the exact failure mode the helpers exist to prevent
    for (q <- Seq(AnalyticsQueries.qSkyline _, AnalyticsQueries.qConcurrency _,
                  AnalyticsQueries.qParetoShare _)) {
      val df = q(spark, sfDir)
      df.collect()
      val s = executed(df).toString
      // every window in these plans comes from the two-level helpers, so
      // each spec must be partitioned on the stamped __pid column
      val bad = s.linesIterator
        .filter(_.contains("windowspecdefinition("))
        .filterNot(_.contains("__pid")).toSeq
      assert(bad.isEmpty, s"window without __pid partitioning:\n${bad.mkString("\n")}")
      graft.operators.Caches.release()
    }
  }

  test("keep_best: quality window heap-rewrites (double order key via IEEE ordinal encoding)") {
    // SURVEY row #140's claim, now plan-asserted (r11 verdict #4): the
    // row_number()=1 selection over (cluster_id ORDER BY quality DESC,
    // doc_id) must rewrite to the bounded graft_topk heap — the order key
    // is a COMPUTED DOUBLE, exactly the shape that silently missed the
    // rewrite before DoubleOrdinalLong existed, so this contract keeps it
    // from regressing. Map tasks then ship ONE candidate per cluster per
    // partition instead of sorting whole clusters through the exchange.
    val df = graft.queries.LlmQueries.qDedupKeepBest(spark, sfDir)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_topk"),
      s"TopKRewriteRule did not fire on the keep-best quality window:\n$opt")
    assert(!opt.contains("row_number"), "window formulation survived the rewrite")
    graft.operators.Caches.release()
  }

  test("example construction: vocab joins broadcast, never sort-merge") {
    // q_mlm_mask's random-replacement pool and q_unigram_encode's token-id
    // resolution both join a ≤2048-row vocab — at corpus scale these MUST
    // be broadcasts; a sort-merge here shuffles the whole token stream.
    for (q <- Seq(graft.queries.LlmQueries.qMlmMask _,
                  graft.queries.LlmQueries.qUnigramEncode _)) {
      val df = q(spark, sfDir)
      df.collect()
      val s = executed(df).toString
      assert(s.contains("BroadcastHashJoin"), s"vocab join not broadcast:\n$s")
      assert(!s.contains("SortMergeJoin"), s"vocab join degraded to sort-merge:\n$s")
      graft.operators.Caches.release()
    }
  }

  test("span corruption: equi joins only, windows partitioned by doc") {
    val df = graft.queries.LlmQueries.qSpanCorrupt(spark, sfDir)
    df.collect()
    val s = executed(df).toString
    assert(!s.contains("NestedLoopJoin") && !s.contains("CartesianProduct"),
      s"span-position join degraded to a product:\n$s")
    val bad = s.linesIterator
      .filter(_.contains("windowspecdefinition("))
      .filterNot(_.contains("doc_id")).toSeq
    assert(bad.isEmpty, s"window not partitioned by doc_id:\n${bad.mkString("\n")}")
  }

  test("cuped: one data-sized shuffle (the per-user aggregate), no joins") {
    val df = graft.queries.AnalyticsQueries.qCuped(spark, sfDir)
    df.collect()
    val s = executed(df).toString
    assert(!s.contains("Join"), s"cuped must be pure aggregation:\n$s")
    // per-user groupBy hash exchange + the SinglePartition gather of the
    // 1-row moment reduce — nothing else may shuffle (the AQE plan string
    // repeats the subtree, so assert on exchange KIND, not count)
    val exchanges = s.linesIterator.filter(_.contains("Exchange")).toSeq
    val data = exchanges.filterNot(_.contains("SinglePartition"))
    assert(data.nonEmpty && data.forall(_.contains("hashpartitioning(user_id")),
      s"unexpected data shuffles:\n${exchanges.mkString("\n")}")
  }

  test("cleaners map stage runs the native single-pass exprs, no regex chains") {
    val df = graft.queries.CoreQueries.qMapperClean(spark, sfDir)
    val s = planString(df)
    assert(s.contains("graft_clean_upc") && s.contains("graft_clean_float") &&
      s.contains("graft_clean_int"), s"native cleaners missing from plan:\n$s")
    // the regex formulations must be fully displaced from the hot path
    // (asinValidate's single RLIKE is the one intended regex)
    assert(!s.contains("regexp_replace"), "regex cleaner chain leaked back into the map stage")
  }
}
