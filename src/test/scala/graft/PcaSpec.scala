package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** Integer power-iteration PCA (`Pca.project`): a driver-side reference
  * model pins the quantize/floor-mean/truncation-rescale contract, planted
  * variance structure proves the direction is found, and projections are
  * partitioning-invariant by construction (integer sums).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Seq[Float])], iters: Int): Map[Long, Long] = {
    val out = Pca.project(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.Caches.release()
    out
  }

  /** The documented integer rule, verbatim. */
  private def ref(vecs: Seq[(Long, Seq[Float])], iters: Int): Map[Long, Long] = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 1000000.0)).toArray }
    val dim = q.head._2.length
    val n = q.size.toLong
    val mean = Array.tabulate(dim)(i => Math.floorDiv(q.map(_._2(i)).sum, n))
    val d = q.map { case (id, v) => id -> v.zip(mean).map { case (a, b) => a - b } }
    val cov = Array.tabulate(dim, dim)((i, j) =>
      d.map { case (_, dv) => BigInt(dv(i)) * dv(j) }.sum)
    var v = Array.fill(dim)(BigInt(1000000L))
    for (_ <- 0 until iters) {
      val u = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val mx = u.map(_.abs).max
      v = u.map(x => (if (x.signum < 0) -BigInt(1) else BigInt(1)) * (x.abs * 1000000L / mx))
    }
    d.map { case (id, dv) =>
      id -> dv.zip(v).map { case (x, w) => x * w.toLong }.sum }.toMap
  }

  // variance dominated by axis 1 (spread ±4), noise on axes 0/2
  private val planted: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(0.1f, 4.0f, -0.2f), 2L -> Seq(-0.1f, -4.0f, 0.1f),
    3L -> Seq(0.2f, 3.5f, 0.2f), 4L -> Seq(-0.2f, -3.5f, -0.1f),
    5L -> Seq(0.0f, 0.5f, 0.3f), 6L -> Seq(0.1f, -0.5f, -0.3f))

  test("operator matches the reference model at several iteration depths") {
    for (iters <- Seq(1, 3, 6)) assert(run(planted, iters) === ref(planted, iters))
  }

  test("the planted dominant axis orders the projections") {
    val got = run(planted, 6)
    // vectors sorted by their axis-1 coordinate must sort identically by
    // projection magnitude (up to a global sign)
    val byAxis = planted.sortBy(_._2(1)).map(_._1)
    val byProj = planted.map(_._1).sortBy(got)
    assert(byProj === byAxis || byProj === byAxis.reverse)
    // extremes project far beyond the noise points
    assert(math.abs(got(1L)) > 4 * math.abs(got(5L)))
  }

  test("projection magnitudes are centering-invariant (constant shift)") {
    val shifted = planted.map { case (id, v) => id -> v.map(_ + 2.0f) }
    val a = run(planted, 4)
    val b = run(shifted, 4)
    // centering removes the shift: same projections (shift is exact in
    // micro-units, so even the floor-mean moves by exactly 2e6)
    assert(a === b)
  }

  test("degenerate constant corpus is rejected, not silently zero") {
    val const = Seq(1L -> Seq(1.0f, 1.0f), 2L -> Seq(1.0f, 1.0f))
    val e = intercept[Exception] {
      run(const, 2)
    }
    assert(e.getMessage.contains("principal direction") ||
      e.getMessage.contains("zero second-moment"))
  }
}
