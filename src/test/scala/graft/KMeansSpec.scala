package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Distributed exact-integer Lloyd k-means (`KMeans`): a driver-side
  * reference model pins the documented rule (micro-unit quantization,
  * integer-L2² argmin with lowest-cid ties, floor-mean update, empty
  * clusters keep their centroid), planted geometry proves the clustering
  * actually separates, and iteration monotonicity holds on the real table.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def quant(v: Seq[Double]): Array[Long] =
    v.map(x => math.round(x * 1e6)).toArray

  /** Reference model of the documented training rule. */
  private def lloydRef(vecs: Seq[(Long, Seq[Double])], k: Int, iters: Int): Array[Array[Long]] = {
    val q = vecs.sortBy(_._1).map { case (id, v) => id -> quant(v) }
    var cents = q.take(k).map(_._2.clone()).toArray
    for (_ <- 0 until iters) {
      val members = q.groupBy { case (_, v) =>
        cents.zipWithIndex.map { case (c, ci) =>
          (c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, ci)
        }.min._2
      }
      cents = cents.zipWithIndex.map { case (c, ci) =>
        members.get(ci) match {
          case Some(m) =>
            c.indices.map { p =>
              val s = m.map(_._2(p)).sum
              val cnt = m.size.toLong
              Math.floorDiv(s, cnt)
            }.toArray
          case None => c
        }
      }
    }
    cents
  }

  test("train matches the reference model (incl. an empty-cluster round)") {
    // seeds are the 3 lowest ids; two tight far-apart blobs → one seed's
    // cluster empties after round 1 and must keep its centroid
    val vecs: Seq[(Long, Seq[Double])] = Seq(
      1L -> Seq(0.001, 0.002), 2L -> Seq(0.0, 0.001), 3L -> Seq(0.002, 0.0),
      4L -> Seq(5.0, 5.0), 5L -> Seq(5.001, 4.999), 6L -> Seq(5.002, 5.001),
      7L -> Seq(-0.5, 0.3))
    val df = vecs.map { case (id, v) => (id, v.map(_.toFloat).toArray) }.toDF("vec_id", "embedding")
    for (iters <- 0 to 3) {
      val got = KMeans.train(df, "vec_id", "embedding", k = 3, iters = iters)
      graft.operators.Caches.release()
      val want = lloydRef(vecs, 3, iters)
      assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq, s"iters=$iters")
    }
  }

  test("cluster separates planted blobs and ties break to the lowest cid") {
    val blobA = (0L until 10L).map(i => i -> Seq(0.0 + i * 1e-4, 0.0))
    val blobB = (10L until 20L).map(i => i -> Seq(9.0, 9.0 + (i - 10) * 1e-4))
    val df = (blobA ++ blobB).map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
    val out = KMeans.cluster(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    graft.operators.Caches.release()
    assert(blobA.forall(v => out(v._1) == out(0L)))
    assert(blobB.forall(v => out(v._1) == out(10L)))
    assert(out(0L) != out(10L))
    // exact tie: equidistant point in a symmetric 2-center layout → cid 0
    val tie = Seq(
      (0L, Array(0f, 0f)), (1L, Array(2f, 0f)), (2L, Array(1f, 0f)))
    val tieOut = KMeans.cluster(tie.toDF("vec_id", "embedding"), "vec_id", "embedding",
        k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    graft.operators.Caches.release()
    assert(tieOut(2L) === 0)
  }

  test("more iterations never increase total within-cluster distance (real table)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val costs = (0 to 3).map { iters =>
      val c = KMeans.cluster(emb, "vec_id", "embedding", k = 8, iters = iters)
        .agg(sum("d2")).head().getLong(0)
      graft.operators.Caches.release()
      c
    }
    // Lloyd's monotonicity holds up to the floor-rounding of centroids —
    // micro-unit floors move each coordinate < 1 micro-unit, negligible
    // against blob-scale distances; assert non-strict decrease with a
    // 0.1% rounding allowance
    costs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + a / 1000, s"cost increased: $costs")
    }
  }

  test("assignment argmin equals a driver-side exhaustive check (real table)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = KMeans.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val got = KMeans.assign(emb, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    graft.operators.Caches.release()
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    vecs.foreach { case (id, v) =>
      val qv = quant(v)
      val want = cents.zipWithIndex.map { case (c, ci) =>
        (c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum, ci)
      }.min
      assert(got(id) === ((want._2, want._1)), s"vec $id")
    }
  }
}
