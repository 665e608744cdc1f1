package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Triangle counting (`Graph.triangleCounts`): known closed-form graphs,
  * canonicalization invariance (direction/duplicates/self-loops erased),
  * and a brute-force reference model on a deterministic pseudo-random
  * graph — the proof that degree-ordered wedge enumeration only reshapes
  * the WORK, never the result.
  */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val out = Graph.triangleCounts(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.operators.Caches.release()
    out
  }

  /** Brute force over the canonical undirected simple graph. */
  private def ref(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val e = edges.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
      .distinct.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val deg = nodes.map(n => n -> e.count(p => p._1 == n || p._2 == n).toLong).toMap
    val ns = nodes.toSeq.sorted
    val tri = for {
      a <- ns; b <- ns if a < b && e((a, b))
      c <- ns if b < c && e((b, c)) && e((a, c))
    } yield (a, b, c)
    val per = tri.flatMap(t => Seq(t._1, t._2, t._3)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    nodes.map(n => n -> (deg(n), per.getOrElse(n, 0L))).toMap
  }

  test("closed forms: K4, square, triangle with pendant") {
    // K4: 4 triangles, every node in 3 of them, degree 3
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(run(k4) === (0L to 3L).map(n => n -> (3L, 3L)).toMap)
    // C4 (square): triangle-free but every node reported with 0
    val c4 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(run(c4) === (0L to 3L).map(n => n -> (2L, 0L)).toMap)
    // triangle + pendant: pendant node sees 0 triangles, degree 1
    val tp = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))
    assert(run(tp) === Map(0L -> (2L, 1L), 1L -> (2L, 1L), 2L -> (3L, 1L), 3L -> (1L, 0L)))
  }

  test("direction, duplicate edges, and self-loops do not change the result") {
    val base = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val noisy = base ++ Seq((1L, 0L), (2L, 1L), (0L, 2L), (0L, 1L), (1L, 1L), (2L, 2L))
    assert(run(noisy) === run(base))
  }

  test("matches brute force on a deterministic pseudo-random graph") {
    // multiplicative-hash edge sample over 40 nodes — dense enough for
    // hundreds of triangles, fixed forever
    val edges = for {
      a <- 0L until 40L; b <- 0L until 40L
      if a < b && ((a * 2654435761L + b * 40503L) % 97) < 22
    } yield (a, b)
    val got = run(edges)
    assert(got === ref(edges))
    assert(got.values.map(_._2).sum > 0, "fixture must actually contain triangles")
  }
}
