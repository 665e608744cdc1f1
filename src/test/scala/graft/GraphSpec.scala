package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Fixed-point PageRank (`Graph.pageRank`): a driver-side reference model
  * pins the floor-division contract, planted structure proves the ranking
  * orders authority correctly, and the fixed-point mass accounting holds.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Reference model of the documented integer rule. */
  private def prRef(edges: Seq[(String, String)], iters: Int,
                    damp: Long = 850L): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val init = Scale / nodes.size
    val base = ((1000L - damp) * init) / 1000L
    var r = nodes.map(_ -> init).toMap
    for (_ <- 0 until iters) {
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => r(x._1) / deg(x._1)).sum
      }
      r = nodes.map(n => n -> (base + (damp * in.getOrElse(n, 0L)) / 1000L)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val out = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.operators.Caches.release()
    out
  }

  test("operator matches the reference model (chain, star, cycle, duplicate edges)") {
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    val star = Seq("h" -> "l1", "l1" -> "h", "h" -> "l2", "l2" -> "h",
      "h" -> "l3", "l3" -> "h")
    val cycle = Seq("x" -> "y", "y" -> "z", "z" -> "x")
    val dups = chain ++ chain // distinct() must collapse these
    for (g <- Seq(chain, star, cycle, dups); it <- 0 to 3)
      assert(run(g, it) === prRef(g, it), s"graph=$g iters=$it")
  }

  test("star hub outranks leaves; symmetric cycle stays uniform") {
    val star = Seq("h" -> "l1", "l1" -> "h", "h" -> "l2", "l2" -> "h",
      "h" -> "l3", "l3" -> "h")
    val r = run(star, 3)
    assert(Seq("l1", "l2", "l3").forall(l => r("h") > r(l)))
    val cyc = run(Seq("x" -> "y", "y" -> "z", "z" -> "x"), 3)
    assert(cyc.values.toSet.size === 1, s"cycle ranks diverged: $cyc")
  }

  test("mass never exceeds the fixed-point budget and only floor loss shrinks it") {
    val g = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "a", "a" -> "c")
    val masses = (0 to 4).map(it => run(g, it).values.sum)
    assert(masses.forall(_ <= Scale))
    // no dangling sources here, so loss per round is only floor residue:
    // strictly bounded by (edges + nodes) units per round
    masses.sliding(2).foreach { case Seq(m0, m1) =>
      assert(m1 <= m0 && m0 - m1 <= 8, s"masses=$masses")
    }
  }

  test("dangling sink drops its mass (documented variant) but still ranks") {
    // b has in-edges only: its received mass leaks each round
    val g = Seq("a" -> "b", "c" -> "b", "a" -> "c", "c" -> "a")
    val r = run(g, 2)
    assert(r.keySet === Set("a", "b", "c"))
    assert(r === prRef(g, 2))
    assert(run(g, 3).values.sum < run(g, 1).values.sum)
  }
}
