package graft

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("word shingles and token counts") {
    val df = Seq("the quick brown fox").toDF("text")
    assert(df.select(TF.wordShingles(col("text"), 2)).first().getSeq[String](0)
      == Seq("the quick", "quick brown", "brown fox"))
    assert(df.select(TF.tokenCountWs(col("text"))).first().getInt(0) == 4)
    // "don't stop!" → don + ' + t + stop + ! = 5 BPE-ish tokens
    assert(Seq("don't stop!").toDF("text").select(TF.tokenCountBpe(col("text"))).first().getInt(0) == 5)
  }

  test("exact dedup groups duplicates under one fingerprint") {
    val docs = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exactGroups(docs, "doc_id", "text").orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("n_docs") == 2 && out.head.getAs[String]("doc_ids") == "1,2")
    assert(out.head.getAs[Int]("sample_cap") == 16)
  }

  test("exact dedup audit sample is bounded under a planted mega-group") {
    // 100 copies of the same page: stats stay exact, the id sample carries
    // only the cap lowest ids, and the cap is pushed below the exchange
    val docs = ((1L to 100L).map(i => (i, "boiler plate page")) :+ (200L, "unique"))
      .toDF("doc_id", "text")
    val df = Dedup.exactGroups(docs, "doc_id", "text", sampleCap = 5)
    // the house TopKRewriteRule turns the row_number window into the native
    // graft_topk heap aggregate (partial heaps BEFORE the exchange — even
    // tighter than Spark's WindowGroupLimit); accept either bounded plan
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_topk") || opt.contains("WindowGroupLimit"),
      s"no group-limit pushdown:\n$opt")
    val out = df.orderBy("keep_id").collect()
    assert(out.length == 2)
    val mega = out.head
    assert(mega.getAs[Long]("n_docs") == 100L)
    assert(mega.getAs[Long]("keep_id") == 1L)
    assert(mega.getAs[String]("doc_ids") == "1,2,3,4,5")
    assert(mega.getAs[Int]("sample_cap") == 5)
    assert(out(1).getAs[String]("doc_ids") == "200")
  }

  test("dropDuplicatesExact materializer is one agg — no audit window in the plan") {
    val docs = Seq((2L, "Hello  World"), (1L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val df = Dedup.dropDuplicatesExact(docs, "doc_id", "text")
    // the materializer must NOT pay the report's sample window + join:
    // min(id) per fingerprint is a single map-side-combined aggregate
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Window") && !opt.contains("graft_topk"),
      s"materializer plan carries the report's audit-sample pass:\n$opt")
    assert(df.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("minhash-LSH finds near-dup pair, exact jaccard filters") {
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2" // j = 38/42 ≈ 0.90
    val c = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.8).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(math.abs(pairs.head.getDouble(2) - 38.0 / 42.0) < 1e-12)
  }

  test("simhash: identical docs hamming 0, disjoint docs far") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val fp = docs.select(col("doc_id"), TF.simhash64(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 10)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("native cosine is bit-identical to the declarative fold on real embeddings") {
    val emb = GraftSession.table(spark, sfDir, "embeddings").limit(50)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .select(VF.cosine(col("a.embedding"), col("b.embedding")).as("fast"),
        VF.cosineDeclarative(col("a.embedding"), col("b.embedding")).as("ref"))
      .collect()
    assert(pairs.nonEmpty && pairs.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine + brute-force ANN ranks the aligned vector first") {
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f)),   // cos 1.0
      (2L, Array(1.0f, 1.0f, 0.0f)),   // cos ~0.707
      (3L, Array(0.0f, 1.0f, 0.0f))    // cos 0.0
    ).toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(q, corpus, "vec_id", "embedding", k = 2).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L))
    assert(math.abs(out.head.getAs[Double]("cosine") - 1.0) < 1e-12)
  }

  test("lang id picks the language with most marker hits; und on none") {
    val out = Seq("the cat is on the mat", "el gato y la casa", "12345")
      .toDF("text").select(TF.langId(col("text"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "es", "und"))
  }

  test("hash split: deterministic, stable under repartitioning, ~80/10/10") {
    val ids = (1L to 2000L).toDF("id")
    val split1 = ids.select(col("id"), graft.functions.Sampling.split(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val split2 = ids.repartition(13)
      .select(col("id"), graft.functions.Sampling.split(col("id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split1 == split2)
    val counts = split1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 100 && math.abs(counts("val") - 200) < 60)
  }

  test("weighted sample: edge probs, monotone in prob, keep rate tracks mean prob") {
    import graft.functions.Sampling.weightedSampled
    val ids = (1L to 4000L).toDF("id")
    assert(ids.filter(weightedSampled(col("id"), lit(0.0))).count() === 0L)
    assert(ids.filter(weightedSampled(col("id"), lit(1.0))).count() === 4000L)
    // u is fixed per key → kept(p) must be a SUBSET of kept(p') for p < p'
    val k30 = ids.filter(weightedSampled(col("id"), lit(0.3))).collect().map(_.getLong(0)).toSet
    val k60 = ids.filter(weightedSampled(col("id"), lit(0.6))).collect().map(_.getLong(0)).toSet
    assert(k30.subsetOf(k60))
    assert(math.abs(k30.size - 1200) < 120 && math.abs(k60.size - 2400) < 150)
    // per-row probability: p = (id % 2) keeps ~half, exactly the odd rows it keeps at p=1
    val varP = ids.filter(weightedSampled(col("id"), (col("id") % 2).cast("double")))
      .collect().map(_.getLong(0)).toSet
    assert(varP.forall(_ % 2 == 1) && math.abs(varP.size - 2000) < 100)
    // the draw is decorrelated from the split hash (different salt stream)
    val unsalted = ids.filter(graft.functions.Sampling.sampled(col("id"), 30))
      .collect().map(_.getLong(0)).toSet
    assert((k30 diff unsalted).nonEmpty && (unsalted diff k30).nonEmpty)
  }

  test("rolling hash is order-sensitive, fingerprint is not whitespace-sensitive") {
    val df = Seq("a b c", "c b a", "a  b  c").toDF("text")
    val rh = df.select(TF.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(rh(0) != rh(1) && rh(0) == rh(2))
    val fps = df.select(TF.contentFingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(2) && fps(0) != fps(1))
  }

  test("shingled near-dup is word-order-sensitive where word sets are blind") {
    val doc = (1 to 40).map(i => s"w$i").mkString(" ")
    val scrambled = scala.util.Random.shuffle((1 to 40).toList).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, doc), (2L, scrambled)).toDF("doc_id", "text")
    // word sets identical → jaccard 1.0
    val bySet = Dedup.nearDupPairs(docs, "doc_id", "text", 0.9).collect()
    assert(bySet.length == 1 && bySet.head.getAs[Double]("jaccard") == 1.0)
    graft.operators.Caches.release()
    // 3-shingle sets nearly disjoint after scrambling → no pair
    val byShingle = Dedup.nearDupPairs(docs, "doc_id", "text", 0.9, shingleN = 3).collect()
    assert(byShingle.isEmpty, byShingle.mkString(";"))
    graft.operators.Caches.release()
  }

  test("native LSH bucket is bit-identical to the declarative md5-plane twin") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
    val both = emb.select(
      VF.lshBucket(col("embedding"), 6).as("native"),
      VF.lshBucketDeclarative(col("embedding"), 6).as("decl")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), s"${r.getLong(0)} != ${r.getLong(1)}"))
  }

  test("sequence packing: offsets chain through each shard stream, stable under repartition") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val packed = graft.operators.Pack.packSequences(docs, "doc_id", "text", "lang",
      maxTokens = 512, shards = 4)
      .select("doc_id", "lang", "shard", "n_tokens", "seq_id", "seq_offset")
    val rows = packed.collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, g) =>
      val stream = g.sortBy(_._3)
      // first doc of every stream opens sequence 0 at offset 0
      assert(stream.head._5 == 0L && stream.head._6 == 0L)
      // each doc starts exactly where the previous one ended (mod window)
      stream.sliding(2).foreach {
        case Array((_, _, _, n1, s1, o1), (_, _, _, _, s2, o2)) =>
          val cum1 = s1 * 512 + o1 + n1
          assert(s2 * 512 + o2 == cum1, "stream must be gapless")
        case _ =>
      }
    }
    // repartition-stable
    val again = graft.operators.Pack.packSequences(docs.repartition(13), "doc_id", "text", "lang",
      maxTokens = 512, shards = 4)
      .select("doc_id", "seq_id", "seq_offset").collect().map(_.toSeq).sortBy(_.toString)
    assert(again.toSeq == packed.select("doc_id", "seq_id", "seq_offset")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("native sorted-intersect size equals size(array_intersect) on canonical word sets") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
      .select(sort_array(TF.wordSet(col("text"))).as("w"))
    val pairs = docs.as("a").crossJoin(docs.as("b")).limit(2000)
    val both = pairs.select(
      graft.plans.NativeHash.sortedIntersectSize(col("a.w"), col("b.w")).as("native"),
      size(array_intersect(col("a.w"), col("b.w"))).as("decl")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getInt(0) == r.getInt(1), s"${r.getInt(0)} != ${r.getInt(1)}"))
  }

  test("early-exit jaccard-ge is bit-identical to the full-intersect predicate") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(120)
      .select(sort_array(TF.wordSet(col("text"))).as("w"))
    val pairs = docs.as("a").crossJoin(docs.as("b")).limit(5000)
    // thresholds straddle the exact-boundary and degenerate cases: 0
    // (early-true on the first loop entry), 1 (only identical sets), and
    // the operators' real cuts
    for (t <- Seq(0.0, 0.3, 0.5, 0.8, 1.0)) {
      val both = pairs.select(
        graft.plans.NativeHash.jaccardGe(col("a.w"), col("b.w"), t).as("fast"),
        graft.plans.NativeHash.sortedIntersectGe(col("a.w"), col("b.w"), t).as("fastN"),
        graft.plans.NativeHash.sortedIntersectSize(col("a.w"), col("b.w")).as("n"),
        (graft.plans.NativeHash.sortedIntersectSize(col("a.w"), col("b.w")).cast("double") /
          (size(col("a.w")) + size(col("b.w")) -
            graft.plans.NativeHash.sortedIntersectSize(col("a.w"), col("b.w"))).cast("double")
          >= lit(t)).as("exact")).collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getBoolean(0) == r.getBoolean(3), s"jaccardGe t=$t: $r")
        // count variant: −1 exactly when below threshold, exact n otherwise
        assert(r.getInt(1) == (if (r.getBoolean(3)) r.getInt(2) else -1),
          s"sortedIntersectGe t=$t: $r")
      }
    }
    // empty vs empty / empty vs non-empty edges
    val edge = Seq((Seq.empty[String], Seq.empty[String]), (Seq.empty[String], Seq("a")),
      (Seq("a"), Seq("a"))).toDF("x", "y")
    val got = edge.select(graft.plans.NativeHash.jaccardGe(col("x"), col("y"), 0.5)).collect()
      .map(_.getBoolean(0)).toSeq
    assert(got == Seq(false, false, true)) // 0/0=NaN → false, 0/1 → false, 1/1 → true
  }

  test("embedding near-dup: brute force finds planted pair; LSH at 0 planes equals brute force") {
    val mk = (base: Seq[Float]) => base.toArray
    val vecs = Seq(
      (1L, mk(Seq(1f, 0f, 0f, 0f))),
      (2L, mk(Seq(0.99f, 0.1f, 0f, 0f))),   // near-dup of 1
      (3L, mk(Seq(0f, 1f, 0f, 0f))),
      (4L, mk(Seq(0f, 0f, 1f, 0f)))
    ).toDF("vec_id", "embedding")
    val brute = Dedup.embedNearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute == Set((1L, 2L)))

    val lsh0 = Dedup.embedNearDupPairsLsh(vecs, "vec_id", "embedding", 0.9,
        nTables = 1, planesPerTable = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh0 == brute)

    // with planes: output is a SUBSET of brute force (same filter, fewer candidates)
    val lsh4 = Dedup.embedNearDupPairsLsh(vecs, "vec_id", "embedding", 0.9,
        nTables = 1, planesPerTable = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh4.subsetOf(brute))
  }
}
