package graft

import graft.operators.{KMeans, Pq, Quant}
import org.apache.spark.sql.functions._

/** r12: the native integer vector-math expressions (graft_l2sq_ll /
  * graft_dot_ll / graft_sub_ll / graft_dot_codes / graft_hamming_words /
  * graft_best_cell / graft_pq_codes / graft_pq_adc) must be bit-identical
  * to the interpreted HOF chains they replaced — randomized vectors plus
  * engineered argmin TIES, checked against the retained declarative twins.
  */
class NativeVecSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def vecs(n: Int, dim: Int, seed: Int): DataFrame =
    spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        pmod(xxhash64(col("id") * lit(seed + 7919) + i), lit(2001L)) - 1000L).as("qv"))

  test("l2sq / dot / sub match the declarative folds on random long vectors") {
    val d = vecs(500, 12, 1)
      .withColumn("bv", transform(col("qv"), x => x * 3L - 17L))
    val cent = (0 until 12).map(i => (i * 13 - 60).toLong)
    val rows = d.select(
      KMeans.l2sq(col("qv"), cent).as("n1"),
      KMeans.l2sqDeclarative(col("qv"), cent).as("d1"),
      graft.plans.NativeHash.dotLL(col("qv"), col("bv")).as("n2"),
      aggregate(zip_with(col("qv"), col("bv"), (x, y) => x * y), lit(0L),
        (acc, v) => acc + v).as("d2"),
      graft.plans.NativeHash.subLL(col("qv"), col("bv")).as("n3"),
      zip_with(col("qv"), col("bv"), (a, b) => a - b).as("d3")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
      assert(r.getSeq[Long](4) == r.getSeq[Long](5))
    }
  }

  test("dot_codes / hamming_words match the declarative folds") {
    val d = spark.range(300).select(col("id"),
      transform(sequence(lit(0), lit(15)), i =>
        (pmod(xxhash64(col("id") + i), lit(255L)) - 127L).cast("tinyint")).as("ca"),
      transform(sequence(lit(0), lit(15)), i =>
        (pmod(xxhash64(col("id") * 3 + i), lit(255L)) - 127L).cast("tinyint")).as("cb"),
      transform(sequence(lit(0), lit(3)), i => xxhash64(col("id") + i)).as("wa"),
      transform(sequence(lit(0), lit(3)), i => xxhash64(col("id") * 5 + i)).as("wb"))
    val rows = d.select(
      Quant.dotCodes(col("ca"), col("cb")).as("n1"),
      Quant.dotCodesDeclarative(col("ca"), col("cb")).as("d1"),
      Quant.hammingDist(col("wa"), col("wb")).as("n2"),
      Quant.hammingDistDeclarative(col("wa"), col("wb")).as("d2")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1))
      assert(r.getInt(2) == r.getInt(3))
    }
  }

  test("best_cell and pq_codes match the declarative argmins, ties included") {
    // centroid 2 duplicates centroid 0: every vector nearest to 0 is an
    // exact argmin TIE with 2 — the lowest-cid rule must pick 0
    val cents: Array[Array[Long]] = Array(
      Array(0L, 0L, 0L, 0L), Array(500L, -500L, 500L, -500L),
      Array(0L, 0L, 0L, 0L), Array(-800L, 800L, -800L, 800L))
    val d = vecs(400, 4, 2)
    val rows = d.select(
      KMeans.bestOf(col("qv"), cents).as("n"),
      KMeans.bestOfDeclarative(col("qv"), cents).as("dcl")).collect()
    rows.foreach { r =>
      assert(r.getStruct(0).getLong(0) == r.getStruct(1).getLong(0))
      assert(r.getStruct(0).getInt(1) == r.getStruct(1).getInt(1))
    }
    // pq: 2 subspaces × 3 cells with a duplicated cell per subspace
    val books: Array[Array[Array[Long]]] = Array(
      Array(Array(0L, 0L), Array(300L, -300L), Array(0L, 0L)),
      Array(Array(100L, 100L), Array(100L, 100L), Array(-900L, 0L)))
    val rows2 = d.select(
      Pq.cidArray(col("qv"), 2, books).as("n"),
      Pq.cidArrayDeclarative(col("qv"), 2, books).as("dcl")).collect()
    rows2.foreach { r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)) }
    // adc: native == reconstruct-and-fold for the assigned codes
    val rows3 = d.select(
      graft.plans.NativeHash.pqAdc(col("qv"), Pq.cidArray(col("qv"), 2, books), books).as("n"),
      (0 until 2).map { s =>
        val rec = element_at(typedLit(books(s).map(_.toSeq).toSeq),
          (element_at(Pq.cidArrayDeclarative(col("qv"), 2, books), s + 1) + 1).cast("int"))
        aggregate(zip_with(slice(col("qv"), s * 2 + 1, 2), rec,
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
      }.reduce(_ + _).as("dcl")).collect()
    rows3.foreach { r => assert(r.getLong(0) == r.getLong(1)) }
  }
}
