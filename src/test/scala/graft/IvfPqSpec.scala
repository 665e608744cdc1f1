package graft

import graft.operators.IvfPq
import org.apache.spark.sql.functions._

/** IVF-PQ (`IvfPq`): a driver-side reference model pins the composed
  * chain (coarse Lloyd round, cell assignment, integer residuals,
  * residual-codebook Lloyd round, codes); search honors the probe set and
  * recovers planted structure through cell routing + m-byte codes.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def quantize(v: Seq[Float]): Array[Long] =
    v.map(x => math.round(x.toDouble * 1000000.0)).toArray

  private def argmin(v: Array[Long], cents: Array[Array[Long]]): Int =
    cents.zipWithIndex.map { case (c, i) =>
      (c.zip(v).map { case (a, b) => (b - a) * (b - a) }.sum, i)
    }.min._2

  private def kmeansRound(q: Seq[(Long, Array[Long])], cents: Array[Array[Long]]): Array[Array[Long]] = {
    val asg = q.map { case (_, v) => argmin(v, cents) }
    val upd = cents.map(_.clone())
    for (c <- cents.indices) {
      val members = q.zip(asg).collect { case ((_, v), a) if a == c => v }
      if (members.nonEmpty) for (p <- cents(c).indices)
        upd(c)(p) = Math.floorDiv(members.map(_(p)).sum, members.length.toLong)
    }
    upd
  }

  /** Reference: (coarse, books, per-id (cell, codes)). */
  private def refModel(vs: Seq[(Long, Seq[Float])], kc: Int, m: Int, ksub: Int)
      : (Array[Array[Long]], Array[Array[Array[Long]]], Map[Long, (Int, Seq[Int])]) = {
    val q = vs.sortBy(_._1).map { case (id, v) => id -> quantize(v) }
    val dim = q.head._2.length
    val sub = dim / m
    val coarse = kmeansRound(q, q.take(kc).map(_._2).toArray)
    val resid = q.map { case (id, v) =>
      val c = argmin(v, coarse)
      (id, c, v.zip(coarse(c)).map { case (a, b) => a - b })
    }
    val seeds = resid.take(ksub).map(_._3)
    var books = Array.tabulate(m, seeds.length)((s, c) => seeds(c).slice(s * sub, (s + 1) * sub))
    // one residual Lloyd round per subspace
    val updated = books.zipWithIndex.map { case (book, s) =>
      kmeansRound(resid.map(r => r._1 -> r._3.slice(s * sub, (s + 1) * sub)), book)
    }
    books = updated
    val codes = resid.map { case (id, c, rv) =>
      id -> ((c, (0 until m).map(s => argmin(rv.slice(s * sub, (s + 1) * sub), books(s)))))
    }.toMap
    (coarse, books, codes)
  }

  private val fixture: Seq[(Long, Seq[Float])] = (0L until 40L).map { i =>
    i -> (0 until 8).map(j => (math.sin(i * 0.61 + j * 1.21) * (j % 3 + 1) - 0.2).toFloat).toSeq
  }

  test("store matches the reference chain: coarse cell + residual codes (kc=4, m=2, ksub=4)") {
    val df = fixture.toDF("vec_id", "embedding")
    val model = IvfPq.train(df, "vec_id", "embedding",
      kc = 4, m = 2, ksub = 4, itersCoarse = 1, itersPq = 1)
    val (refCoarse, refBooks, refCodes) = refModel(fixture, kc = 4, m = 2, ksub = 4)
    assert(model.coarse.map(_.toSeq).toSeq === refCoarse.map(_.toSeq).toSeq)
    assert(model.books.map(_.map(_.toSeq).toSeq).toSeq === refBooks.map(_.map(_.toSeq).toSeq).toSeq)
    val got = IvfPq.store(df, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    for ((id, cid, s, code) <- got) {
      val (refCid, refSubCodes) = refCodes(id)
      assert(cid == refCid, s"id=$id cell")
      assert(code == refSubCodes(s), s"id=$id sub=$s")
    }
    assert(got.length == fixture.length * 2)
  }

  test("store matches the reference chain on the real embeddings table (kc=8, m=4, ksub=16)") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val rows = df.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val model = IvfPq.train(df, "vec_id", "embedding",
      kc = 8, m = 4, ksub = 16, itersCoarse = 1, itersPq = 1)
    val (_, _, refCodes) = refModel(rows, kc = 8, m = 4, ksub = 16)
    val got = IvfPq.store(df, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    for ((id, cid, s, code) <- got) {
      val (refCid, refSubCodes) = refCodes(id)
      assert(cid == refCid && code == refSubCodes(s), s"id=$id sub=$s")
    }
  }

  test("search only returns candidates from the np probed cells") {
    val df = fixture.toDF("vec_id", "embedding")
    val model = IvfPq.train(df, "vec_id", "embedding",
      kc = 4, m = 2, ksub = 4, itersCoarse = 1, itersPq = 1)
    val (refCoarse, _, refCodes) = refModel(fixture, kc = 4, m = 2, ksub = 4)
    val got = IvfPq.annTopK(df.filter(col("vec_id") < 3), df, "vec_id", "embedding",
        model, np = 2, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    for ((qid, nid) <- got) {
      val qv = quantize(fixture.find(_._1 == qid).get._2)
      val probed = refCoarse.zipWithIndex.map { case (c, i) =>
        (c.zip(qv).map { case (a, b) => (b - a) * (b - a) }.sum, i)
      }.sorted.take(2).map(_._2).toSet
      assert(probed.contains(refCodes(nid)._1), s"query=$qid neighbor=$nid outside probes")
    }
  }

  test("search recovers planted twins through cell routing + residual codes") {
    def mdVal(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 15
      while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
      java.lang.Long.remainderUnsigned(v, 2000L) / 1000.0 - 1.0
    }
    val dim = 32
    val base = Array.tabulate(60, dim)((i, j) => mdVal(s"vec$i:$j").toFloat)
    val twin = Array.tabulate(30, dim)((i, j) => (base(i)(j) + 0.05 * mdVal(s"noise$i:$j")).toFloat)
    val all = (base ++ twin).zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("vec_id", "embedding")
    val model = IvfPq.train(all, "vec_id", "embedding",
      kc = 4, m = 4, ksub = 16, itersCoarse = 1, itersPq = 1)
    val top1 = IvfPq.annTopK(all.filter(col("vec_id") >= 60), all,
        "vec_id", "embedding", model, np = 2, k = 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 30).count(i => top1.get(60L + i).contains(i.toLong))
    assert(hits >= 22, s"IVF-PQ top-1 recall too low: $hits/30")
  }
}
