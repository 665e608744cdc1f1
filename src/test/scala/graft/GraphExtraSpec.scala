package graft

import graft.operators.{Caches, Graph}
import org.apache.spark.sql.functions._

/** k-core peeling, bounded multi-source BFS, and exact-integer HITS —
  * each pinned against a driver-side reference model of the documented
  * rule, plus the structural properties that make the operator the right
  * tool (peel-order independence, frontier monotonicity, mutual
  * reinforcement).
  */
class GraphExtraSpec extends SparkSpec {
  import spark.implicits._

  private def sym(edges: Seq[(String, String)]): Map[String, Set[String]] = {
    val e = edges.filter(t => t._1 != t._2)
    (e ++ e.map(t => t._2 -> t._1)).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
  }

  private def kCoreRef(edges: Seq[(String, String)], k: Int): Map[String, Int] = {
    val adj = sym(edges)
    var alive = adj.keySet
    var stable = false
    while (!stable) {
      val next = alive.filter(n => (adj(n) & alive).size >= k)
      stable = next == alive
      alive = next
    }
    alive.map(n => n -> (adj(n) & alive).size).toMap
  }

  test("kCore matches the reference model on pendant-chain and clique fixtures") {
    // K4 with a pendant chain hanging off it and an isolated edge: the
    // 2-core is exactly the K4 (chain peels in cascade, edge peels round 1)
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    val chain = Seq("d" -> "e", "e" -> "f", "f" -> "g")
    val iso = Seq("x" -> "y")
    val edges = k4 ++ chain ++ iso
    val got = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    Caches.release()
    assert(got == kCoreRef(edges, 2))
    assert(got.keySet == Set("a", "b", "c", "d"))
    assert(got.values.forall(_ == 3))
  }

  test("kCore on the real repeat-business graph equals the reference model") {
    val edges = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(countDistinct(col("o_orderkey")).as("no")).filter(col("no") >= 2)
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val pairs = edges.collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    // maxRounds = the oracle's unroll depth: the operator's own
    // convergence require fails here if the gated fixture ever needs
    // more peel rounds than qKcoreSql replays
    val got = Graph.kCore(edges, "src", "dst", k = 2,
        maxRounds = graft.queries.AnalyticsQueries.kcoreUnrollRounds)
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    Caches.release()
    assert(got == kCoreRef(pairs, 2))
  }

  test("kCore converges within the oracle's unroll depth on the DRIVER-GATED sf0.01 fixture") {
    // the driver's DuckDB gate replays kcoreUnrollRounds fixed peel rounds
    // at sf0.01; kCore's own convergence require fails this spec if that
    // fixture ever needs more rounds than the oracle unrolls
    val out = graft.queries.AnalyticsQueries.qKcore(spark, "/root/testdata/sf0.01")
    val kc = Graph.kCore(
      spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .join(spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("l_suppkey"))
        .agg(countDistinct(col("o_orderkey")).as("no")).filter(col("no") >= 2)
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst")),
      "src", "dst", k = 2,
      maxRounds = graft.queries.AnalyticsQueries.kcoreUnrollRounds)
    assert(kc.count() == out.count())
    Caches.release()
  }

  private def bfsRef(edges: Seq[(String, String)], seeds: Seq[String],
                     rounds: Int): Map[String, Long] = {
    val adj = sym(edges).withDefaultValue(Set.empty[String])
    var dist = seeds.map(_ -> 0L).toMap
    for (r <- 1 to rounds) {
      val nf = dist.filter(_._2 == r - 1).keys
        .flatMap(adj(_)).filterNot(dist.contains)
      dist = dist ++ nf.map(_ -> r.toLong)
    }
    dist
  }

  test("bfsHops matches the reference model; settled hops never change") {
    val edges = Seq("s" -> "a", "a" -> "b", "b" -> "c", "c" -> "d",
      "s" -> "b", "q" -> "r") // shortcut s→b; (q,r) unreachable
    for (r <- 0 to 3) {
      val got = Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst", Seq("s"), r)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      Caches.release()
      assert(got == bfsRef(edges, Seq("s"), r), s"rounds=$r")
    }
    // shortcut wins: b is 1 hop, c 2, d 3; q/r never appear
    val g3 = Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst", Seq("s"), 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    Caches.release()
    assert(g3 == Map("s" -> 0L, "a" -> 1L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }

  test("bfsHops: a seed with no edges is reported at distance 0, not dropped") {
    val edges = Seq("a" -> "b")
    val got = Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst",
        Seq("a", "z"), 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    Caches.release()
    assert(got == Map("a" -> 0L, "b" -> 1L, "z" -> 0L))
    assert(got == bfsRef(edges, Seq("a", "z"), 2))
  }

  private def hitsRef(edges: Seq[(String, String)], iters: Int,
                      scale: Long): Map[String, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var hub = nodes.map(_ -> scale / nodes.size).toMap
    var auth = hub
    for (_ <- 0 until iters) {
      val ra = nodes.map(n => n -> e.filter(_._2 == n).map(x => hub(x._1)).sum).toMap
      val ta = math.max(1L, ra.values.sum)
      auth = ra.map { case (n, v) => n -> (v * scale) / ta }
      val rh = nodes.map(n => n -> e.filter(_._1 == n).map(x => auth(x._2)).sum).toMap
      val th = math.max(1L, rh.values.sum)
      hub = rh.map { case (n, v) => n -> (v * scale) / th }
    }
    nodes.map(n => n -> (hub(n), auth(n))).toMap
  }

  test("hits matches the reference model; the shared supplier out-scores the exclusive one") {
    // c1 and c2 both buy from s1; only c2 buys from s2 → auth(s1) > auth(s2),
    // and c2 (two strong suppliers) out-hubs c1
    val edges = Seq("c1" -> "s1", "c2" -> "s1", "c2" -> "s2", "c3" -> "s3")
    val got = Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Caches.release()
    assert(got == hitsRef(edges, 2, 1000000L))
    assert(got("s1")._2 > got("s2")._2)
    assert(got("c2")._1 > got("c1")._1)
    assert(got("s1")._1 == 0L, "pure authority has no out-edges, hub mass 0")
  }
}
