package graft

/** LSH S-curve tuning report: the empirical banded-minhash candidate
  * rate must track the closed-form 1 − (1−s²)^b at each similarity
  * decile, the denominators come from the exact prefix-filter pair
  * graph, and the theory literals replay in BigInt.
  */
class LshTuningSpec extends SparkSpec {

  test("q_lsh_tuning: empirical rate tracks theory; accounting invariants hold") {
    val rows = graft.queries.LlmQueries.qLshTuning(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    graft.operators.Caches.release()
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 5 && r._1 <= 9))
    rows.foreach { case (d, nPairs, nCand, emp, theory) =>
      assert(nCand <= nPairs, s"decile $d candidates exceed pairs")
      assert(emp == nCand * 1000000L / nPairs, s"decile $d emp_ppm division")
      // theory literal replays the exact BigInt closed form
      val num = BigInt(400 - (2 * d + 1) * (2 * d + 1))
      val den = BigInt(400)
      val want = (((den.pow(12) - num.pow(12)) * 1000000) / den.pow(12)).toLong
      assert(theory == want, s"decile $d theory literal drift")
      // the S-curve promise: with enough pairs, empirical within 5% of
      // the midpoint theory (pairs spread across the decile, so the
      // midpoint is an approximation of the decile's true mixture; the
      // gap is deterministic per dataset, ~3.3% at sf0.001's decile 5)
      if (nPairs >= 200)
        assert(math.abs(emp - theory) < 50000L,
          s"decile $d: empirical $emp vs theory $theory drifted > 5%")
    }
    // monotone rates: more similar pairs can only be caught more often
    val byD = rows.sortBy(_._1).map(_._4)
    assert(byD.zip(byD.tail).forall { case (a, b) => a <= b + 5000 },
      "empirical S-curve should be (noise-tolerantly) nondecreasing")
  }
}
