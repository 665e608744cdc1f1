package graft

import graft.operators.{Fluency, Sketch}
import org.apache.spark.sql.functions._

/** HLL / CMS sketches and bigram fluency: estimate accuracy, the guarantees
  * (CMS est ≥ true; HLL duplicate-invariance), mergeability (the distributed
  * / incremental property), and fluency's integer-exact arithmetic.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def ids(from: Int, until: Int) =
    (from until until).map(i => s"val-$i").toDF("v")

  test("HLL estimate lands within 3% on 100k distinct values") {
    val est = Sketch.hllEstimate(Sketch.hllRegisters(ids(0, 100000), "v"))
    assert(math.abs(est - 100000) / 100000.0 < 0.03, s"est=$est")
  }

  test("HLL small-range (linear counting) branch is accurate at n=100") {
    val est = Sketch.hllEstimate(Sketch.hllRegisters(ids(0, 100), "v"))
    assert(math.abs(est - 100) / 100.0 < 0.05, s"est=$est")
  }

  test("HLL inclusion-exclusion recovers a planted overlap within sketch error") {
    // A = 0..5999, B = 4000..9999 → |A∩B| = 2000; p=10 (m=1024, ~3.3% σ)
    val ra = Sketch.hllRegisters(ids(0, 6000), "v", p = 10)
    val rb = Sketch.hllRegisters(ids(4000, 10000), "v", p = 10)
    val ru = Sketch.hllMerge(ra, rb)
    val (ea, eb, eu) = (Sketch.hllEstimate(ra, 10), Sketch.hllEstimate(rb, 10),
      Sketch.hllEstimate(ru, 10))
    val inter = ea + eb - eu
    // intersect variance compounds three estimates — allow 4σ of each
    assert(math.abs(inter - 2000) < 0.13 * 6000, s"est=$inter")
    // union is monotone: merged sketch can never estimate below a part
    assert(eu >= math.max(ea, eb) * 0.97, s"eu=$eu ea=$ea eb=$eb")
  }

  test("duplicates never move the registers: sketch(x3 copies) == sketch") {
    val once = Sketch.hllRegisters(ids(0, 5000), "v")
    val tripled = Sketch.hllRegisters(
      ids(0, 5000).union(ids(0, 5000)).union(ids(0, 5000)), "v")
    assert(once.exceptAll(tripled).isEmpty && tripled.exceptAll(once).isEmpty)
  }

  test("HLL merge of disjoint shards == sketch of the whole corpus") {
    val whole = Sketch.hllRegisters(ids(0, 20000), "v")
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(ids(0, 12000), "v"),
      Sketch.hllRegisters(ids(12000, 20000), "v"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
    // overlapping shards too: merge is idempotent on the overlap
    val overlapped = Sketch.hllMerge(
      Sketch.hllRegisters(ids(0, 15000), "v"),
      Sketch.hllRegisters(ids(5000, 20000), "v"))
    assert(whole.exceptAll(overlapped).isEmpty && overlapped.exceptAll(whole).isEmpty)
  }

  test("HLL estimate stays finite and sane at p=16 (no Long wrap in the dyadic sum)") {
    // the empty-bucket term (m - rows)·2^49 is ~2^65 at p=16 — a Long
    // accumulator wraps to garbage/Infinity; BigInt keeps it exact
    val estEmpty = Sketch.hllEstimate(Sketch.hllRegisters(ids(0, 0), "v", p = 16), p = 16)
    assert(estEmpty == 0.0, s"empty corpus at p=16 gave $estEmpty")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(ids(0, 5000), "v", p = 16), p = 16)
    assert(math.abs(est - 5000) / 5000.0 < 0.05, s"est=$est")
  }

  test("HLL merge of mismatched precisions fails fast at estimate time") {
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(ids(0, 3000), "v", p = 12),
      Sketch.hllRegisters(ids(0, 3000), "v", p = 10))
    val e = intercept[IllegalArgumentException] { Sketch.hllEstimate(merged, p = 12) }
    assert(e.getMessage.contains("precision"))
    // and the right precision is demanded even for a clean single-p table
    val clean = Sketch.hllRegisters(ids(0, 3000), "v", p = 10)
    intercept[IllegalArgumentException] { Sketch.hllEstimate(clean, p = 12) }
  }

  // zipfian-ish corpus: token t_k appears ~N/k times
  private def zipf(n: Int) =
    (1 to n).flatMap(k => Seq.fill(n / k)(s"t$k")).toDF("tok")

  test("CMS estimates dominate true counts, exactly, for every key") {
    val df = zipf(64)
    val truth = df.groupBy("tok").count()
    val under = Sketch.cmsEstimates(df, "tok")
      .join(truth, col("k") === col("tok"))
      .filter(col("est") < col("count")).count()
    assert(under == 0L)
  }

  test("CMS is exact on the heavy hitters of a zipfian corpus") {
    val df = zipf(64)
    val truth = df.groupBy("tok").count()
    // top-8 true heavy hitters: est must equal true count (w=1024 slots vs
    // 64 distinct keys → collisions with another heavy key are impossible
    // unless md5 buckets collide, which the assertion would surface)
    val wrong = Sketch.cmsEstimates(df, "tok")
      .join(truth.orderBy(desc("count")).limit(8), col("k") === col("tok"))
      .filter(col("est") =!= col("count")).count()
    assert(wrong == 0L)
  }

  test("CMS counter tables merge by addition: shard-sum == whole") {
    val whole = Sketch.cmsTable(zipf(64), "tok")
    val a = zipf(64).limit(100)
    val b = zipf(64).exceptAll(a)
    val merged = Sketch.cmsTable(a, "tok").unionByName(Sketch.cmsTable(b, "tok"))
      .groupBy("i", "slot").agg(sum("cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("native graft_md5_mod == declarative md5Lower/pmod for any modulus") {
    // adversarial fuzz: unicode, empties, long strings — and moduli that
    // exercise the unsigned-mod boundary (top-bit-set hashes): powers of
    // two (the sketch configs) and a non-power-of-two
    val strs = (0 until 2000).map(i => s"tok-$i-é世${"x" * (i % 17)}") ++
      Seq("", " ", "a b", "ıI")
    val df = strs.toDF("s")
    for (m <- Seq(97L, 1024L, 4096L, 1L << 48)) {
      val mismatches = df.select(
          graft.plans.NativeHash.md5Mod(col("s"), m).as("nat"),
          pmod(graft.functions.Sampling.md5Lower(col("s")), lit(m)).cast("long").as("dec"))
        .filter(col("nat") =!= col("dec")).count()
      assert(mismatches == 0L, s"m=$m")
    }
  }

  // ---- bloom filter ------------------------------------------------------

  test("bloom: no false negatives — every inserted key probes member=true") {
    val inserted = ids(0, 2000)
    val bits = Sketch.bloomBits(inserted, "v", k = 4, m = 16384).cache()
    val verdicts = Sketch.bloomMightContain(inserted, bits, "v")
    assert(verdicts.count() == 2000L)
    assert(verdicts.filter(!col("member")).count() == 0L)
    bits.unpersist()
  }

  test("bloom: measured false-positive ratio tracks fill^k") {
    val n = 2000; val k = 4; val m = 16384
    val bits = Sketch.bloomBits(ids(0, n), "v", k = k, m = m).cache()
    val setCount = bits.count().toDouble
    val fill = setCount / m // actual fill after hash collisions
    val probes = (100000 until 110000).map(i => s"val-$i").toDF("v") // disjoint from inserted
    val fp = Sketch.bloomMightContain(probes, bits, "v")
      .filter(col("member")).count().toDouble / 10000.0
    val expected = math.pow(fill, k)
    // 10k probes at fp≈0.15: ±5 sigma ≈ ±0.018 — generous but real bound
    assert(math.abs(fp - expected) < 0.02, s"fp=$fp expected≈$expected (fill=$fill)")
    bits.unpersist()
  }

  test("bloom: merge is associative and idempotent, shard-union == whole") {
    val (a, b, c) = (ids(0, 500), ids(500, 1000), ids(800, 1500))
    def bs(df: org.apache.spark.sql.DataFrame) = Sketch.bloomBits(df, "v", k = 3, m = 8192)
    val whole = bs(ids(0, 1500))
    val leftAssoc = Sketch.bloomMerge(Sketch.bloomMerge(bs(a), bs(b)), bs(c))
    val rightAssoc = Sketch.bloomMerge(bs(a), Sketch.bloomMerge(bs(b), bs(c)))
    val selfMerge = Sketch.bloomMerge(whole, whole)
    for (m <- Seq(leftAssoc, rightAssoc, selfMerge))
      assert(whole.exceptAll(m).isEmpty && m.exceptAll(whole).isEmpty)
  }

  test("bloom: probing a mixed-(k,m) merged table is refused") {
    val mixed = Sketch.bloomMerge(
      Sketch.bloomBits(ids(0, 100), "v", k = 4, m = 16384),
      Sketch.bloomBits(ids(0, 100), "v", k = 3, m = 8192))
    val e = intercept[IllegalArgumentException] {
      Sketch.bloomMightContain(ids(0, 10), mixed, "v")
    }
    assert(e.getMessage.contains("mixed"))
  }

  test("bloom: probing an EMPTY bit table yields all-false verdicts, not a crash") {
    // legitimate nothing-inserted state: bloomBits of an empty frame has
    // zero rows and hence no (k, m) row — every probe is a definite
    // non-member (no set positions exist)
    val empty = Sketch.bloomBits(ids(0, 0), "v", k = 4, m = 1024)
    assert(empty.count() == 0L)
    val verdicts = Sketch.bloomMightContain(ids(0, 5), empty, "v")
    assert(verdicts.count() == 5L)
    assert(verdicts.filter(col("member")).count() == 0L)
  }

  test("bloom: NULL keys are dropped on insert and probe — never a false negative") {
    val withNulls = (Seq[Option[String]](None, Some("x"), Some("y"), None))
      .toDF("v")
    val bits = Sketch.bloomBits(withNulls, "v", k = 4, m = 1024).cache()
    // no NULL pos row pollutes the bit table
    assert(bits.filter(col("pos").isNull).count() == 0L)
    // inserted non-null keys still probe true; NULL probe rows are dropped,
    // not reported as (arbitrary) members/non-members
    val verdicts = Sketch.bloomMightContain(withNulls, bits, "v")
    assert(verdicts.count() == 2L)
    assert(verdicts.filter(!col("member")).count() == 0L)
    bits.unpersist()
  }

  test("bigram fluency matches hand-computed corpus-conditional probabilities") {
    // corpus: "a b", "a b", "a c" → c1(a)=3, c2(a,b)=2, c2(a,c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = Fluency.bigramFluency(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "fluency_micro_sum")
      .as[(Long, Long, Long)].collect().toSeq
    // P(b|a) = 2/3 → 666666 micro; P(c|a) = 1/3 → 333333 micro
    assert(got == Seq((1L, 1L, 666666L), (2L, 1L, 666666L), (3L, 1L, 333333L)))
  }

  test("fluency routes are result-identical: occurrence joins == pre-aggregated") {
    // heavy within-doc repetition — the case where the pre-aggregation
    // actually reduces (k > 1) and the k-weighted arithmetic must still
    // reproduce the occurrence-wise sums exactly
    val docs = Seq(
      (1L, "of the of the of the of the"),
      (2L, "the of the of zz qq"),
      (3L, "of of of of of")).toDF("doc_id", "text")
    val a = Fluency.bigramFluency(docs, "doc_id", "text", preAggregate = false)
      .orderBy("doc_id").collect().toSeq
    val b = Fluency.bigramFluency(docs, "doc_id", "text", preAggregate = true)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    graft.operators.Caches.release()
  }

  test("fluency is partition-invariant and excludes sub-bigram docs") {
    val docs = Seq((1L, "x y z x y"), (2L, "solo"), (3L, ""), (4L, "x y"))
      .toDF("doc_id", "text")
    val once = Fluency.bigramFluency(docs, "doc_id", "text").orderBy("doc_id").collect().toSeq
    val wide = Fluency.bigramFluency(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(once == wide)
    assert(once.map(_.getLong(0)) == Seq(1L, 4L)) // doc 2 (1 token) and 3 (empty) excluded
    graft.operators.Caches.release()
  }

  test("join-size estimate: one-sided (est >= exact), exact matches group-count audit") {
    val rep = graft.queries.SketchQueries.qJoinSizeEstimate(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep.keySet == Set("orders_lineitem", "events_self"))
    rep.foreach { case (name, (est, exact, err)) =>
      assert(est >= exact, s"$name: CMS inner product must over-estimate")
      assert(err == (est - exact) * 1000000L / exact, s"$name err_ppm")
    }
    // exact audits against independent joins on the small table
    val ol = spark.read.parquet(s"$sfDir/orders.parquet").select("o_orderkey")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(rep("orders_lineitem")._2 == ol)
    val counts = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").count().collect().map(_.getLong(1))
    assert(rep("events_self")._2 == counts.map(c => c * c).sum)
  }
}
