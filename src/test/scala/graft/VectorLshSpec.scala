package graft

import graft.functions.VectorFunctions
import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.functions._

/** Multi-table hyperplane LSH (OR-of-ANDs) — the embedding analogue of the
  * banded minhash route, held to the same evidence standard:
  *   - native keys == declarative keys (the spec-level route equivalence)
  *   - nTables=1 reproduces the legacy single-table bucket bits exactly
  *   - a MEASURED recall curve on a planted-twin corpus: one table misses,
  *     tables drive recall to 1 at constant per-table bucket size
  *   - the forced (32 tables × 2 planes) config — what q_dedup_embed_lsh
  *     pins under the brute-force all-pairs oracle — equals brute force on
  *     the real corpus WITH margin (every true pair collides in ≥2 tables,
  *     so the oracle equality isn't hanging on any single table)
  *
  * Everything here is deterministic: the md5-derived plane family and the
  * md5-derived synthetic corpus make recall a fixed measurable fact, not a
  * seed-dependent sample.
  */
class VectorLshSpec extends SparkSpec {
  import spark.implicits._

  /** md5-derived deterministic value in [-1, 1) — same uint64 family as the
    * plane components, different namespace.
    */
  private def mdVal(s: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    java.lang.Long.remainderUnsigned(v, 2000L) / 1000.0 - 1.0
  }

  /** 60 base vectors + 30 planted twins (base + 5% noise → cosine ≈ 0.998);
    * background pairs stay below 0.6.
    */
  private lazy val planted = {
    val dim = 32
    val base = Array.tabulate(60, dim)((i, j) => mdVal(s"vec$i:$j").toFloat)
    val twin = Array.tabulate(30, dim)((i, j) => (base(i)(j) + 0.05 * mdVal(s"noise$i:$j")).toFloat)
    (base ++ twin).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("vec_id", "embedding")
  }

  test("native multi-table keys equal the declarative formulation and embed the single-table bucket") {
    val rows = planted
      .select(
        VectorFunctions.lshKeys(col("embedding"), 4, 6).as("native"),
        VectorFunctions.lshKeysDeclarative(col("embedding"), 4, 6).as("decl"),
        VectorFunctions.lshKeys(col("embedding"), 1, 8).as("one"),
        VectorFunctions.lshBucket(col("embedding"), 8).as("bucket"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      // table 0 owns global planes 0..k-1 — the single-table key IS the
      // legacy bucket (t=0 contributes no high bits)
      assert(r.getSeq[Long](2) == Seq(r.getLong(3)))
    }
  }

  test("recall curve on planted twins: one table misses, tables drive recall to 1") {
    val brute = Dedup.embedNearDupPairs(planted, "vec_id", "embedding", 0.98)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.size == 30) // exactly the planted twins

    val recalls = Seq(1, 2, 4, 8).map { l =>
      val got = Dedup.embedNearDupPairsLsh(planted, "vec_id", "embedding", 0.98,
          nTables = l, planesPerTable = 8)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.subsetOf(brute)) // LSH is candidate pruning + same verify
      l -> got.size.toDouble / brute.size
    }
    info(s"recall by nTables (k=8): ${recalls.map { case (l, r) => f"L=$l:$r%.3f" }.mkString(", ")}")
    // single table misses planted pairs; OR-ing tables recovers them
    assert(recalls.head._2 < 1.0)
    assert(recalls.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(recalls.last._2 == 1.0)
  }

  test("forced oracle config (32 tables x 2 planes) equals brute force on the corpus, with table margin") {
    val emb = GraftSession.table(spark, sfDir, "embeddings")
    val brute = Dedup.embedNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embedNearDupPairsLsh(emb, "vec_id", "embedding", 0.3,
        nTables = 32, planesPerTable = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == brute)

    // margin: every true pair collides in >= 2 independent tables — the
    // oracle equality survives removing any one table's contribution
    val keyed = emb.select(col("vec_id").as("id"),
      explode(VectorFunctions.lshKeys(col("embedding"), 32, 2)).as("bk"))
    val tableCounts = keyed.as("a")
      .join(keyed.as("b"), col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_tables"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    val margins = brute.toSeq.map(tableCounts.getOrElse(_, 0L))
    info(s"true pairs: ${brute.size}, min colliding tables: ${margins.min}")
    assert(margins.min >= 2)
  }

  test("registered production posture (8x16) on the real corpus: verified subset of brute force, nonempty") {
    // the r9 registry entry q_dedup_embed_lsh_prod: the benched artifact IS
    // the scale path. On this adversarially weak corpus (true pairs at
    // cosine 0.30-0.51) the 16-plane tables admit only the strongest pairs
    // — a deterministic, hash-gated subset of the brute-force truth; the
    // recall story for real (0.98-cosine) near-dups is the scale-probe
    // test below.
    // sf0.01 — the driver's gate corpus (at sf0.001 the 16-plane keys may
    // legitimately admit nothing, which would make nonEmpty vacuous)
    val emb = GraftSession.table(spark, "/root/testdata/sf0.01", "embeddings")
    val brute = Dedup.embedNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val prod = Dedup.embedNearDupPairsLsh(emb, "vec_id", "embedding", 0.3,
        nTables = 8, planesPerTable = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(prod.subsetOf(brute), s"non-true pair leaked past the verify: ${prod -- brute}")
    assert(prod.nonEmpty, "the registered gate must decide something at sf0.01")
    graft.operators.Caches.release()
  }

  test("scale-probe corpus: production 8x16 config recovers planted pairs, background prunes to zero") {
    // the EmbedScaleProbe corpus at CI size — pins the corpus shape the
    // sf1 scale evidence stands on: planted near-dups (cos ≈ 0.98) are
    // found at ≥ 0.95 recall, and NOTHING else clears the 0.8 threshold
    // (background cosines concentrate near 0 at dim 64)
    val vecs = graft.EmbedScaleProbe.corpus(spark, 2000)
    val pairs = graft.operators.Dedup.embedNearDupPairsLsh(
        vecs, "vec_id", "embedding", threshold = 0.8,
        nTables = 8, planesPerTable = 16)
      .select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val planted = 20 // n/100
    assert(pairs.size >= (planted * 95) / 100, s"recall too low: ${pairs.size}/$planted")
    // every found pair IS a planted pair: (i*100, 2000 + i)
    assert(pairs.forall { case (a, b) => b >= 2000 && a == (b - 2000) * 100 },
      s"background pair leaked past the verify: $pairs")
    graft.operators.Caches.release()
  }
}
