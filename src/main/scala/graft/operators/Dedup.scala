package graft.operators

import graft.functions.TextFunctions
import graft.plans.NativeHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication family (SURVEY.md §2.3): exact, MinHash+LSH,
  * SimHash. Each stage is shuffle-bounded — no all-pairs scan ever
  * materializes; candidates come from hash-bucket joins.
  */
object Dedup {

  /** Unpersist operator-internal caches — see [[Caches.release]]. */
  def releaseCaches(): Unit = Caches.release()

  /** Exact duplicate groups by content fingerprint. One groupBy shuffle with
    * map-side combine; at 100 TB the md5 keys shuffle, not the documents.
    * The id-list payload is per-fingerprint-bounded — this is the audit
    * view; the dedup MATERIALIZER ([[dropDuplicatesExact]]) aggregates only
    * min(id) per fingerprint and is safe under pathological duplication
    * (a boilerplate page with 10⁸ copies costs one min, not a 10⁸ array).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.contentFingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).as("keep_id"),
        array_join(sort_array(collect_list(col(idCol).cast("string"))), ",").as("doc_ids")
      )

  /** The dedup OUTPUT: one surviving row per distinct content fingerprint
    * (lowest id wins). Shuffles only (fingerprint, id) pairs, then
    * broadcast-or-shuffle joins the winners back to the full rows — at
    * 100 TB the document bodies move at most once.
    */
  def dropDuplicatesExact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol).select(col("keep_id").as(idCol))
    docs.join(keep, idCol)
  }

  /** Banded bucket keys over a minhash signature: band i's key is a
    * polynomial combine of signature values [i·r, i·r+r) seeded by the band
    * index, so one long column is the whole (band, r-row-slice) identity.
    * With r ≥ 2 a bucket collision needs agreement on r independent
    * minhashes — the "globally-minimum-hashed common word" mega-bucket of
    * single-value bands (every doc containing that word shares the band
    * value) shrinks by another factor of P[agree] per extra row. Candidate
    * recall for a pair at jaccard j is 1 − (1 − j^r)^bands.
    */
  private[graft] def bandKeys(sig: Column, bands: Int, r: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), i =>
      aggregate(slice(sig, i * lit(r) + lit(1), lit(r)),
        (i + lit(1)).cast("long"),
        (acc, v) => acc * lit(1000003L) + v))

  /** MinHash-LSH candidate pairs (id_a < id_b): docs sharing ≥1 of `bands`
    * banded bucket keys (r minhash rows per band). Defaults bands=20, r=2:
    * P[miss] = (1 − j²)^20 ≈ 1.3e-9 at j = 0.8 — zero expected misses up
    * to billions of pairs — while bucket sizes under common-word skew stay
    * bounded (a single-hash band puts every doc containing the globally
    * minimum-hashed word in ONE bucket; an r=2 key needs two such
    * agreements, shrinking buckets quadratically). Precision is restored by
    * the exact-jaccard verify in [[nearDupPairs]].
    *
    * Scale: explode `bands` keys per doc → groupBy-free equi-join on the
    * key. The band index is baked into the key's seed, so a plain key join
    * reproduces exactly the "∃ band pair agreeing" predicate the broadcast
    * path's arrays_overlap evaluates — both strategies see identical
    * candidate sets. Residual skew is handled by AQE skew-join splitting;
    * the verify join only ever sees candidate pairs.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        bands: Int = 20, r: Int = 2): DataFrame = {
    // both self-join sides read the keys frame — persist the slim
    // (id, bands longs) projection so the signature (the dominant map cost
    // over a 100 TB corpus: one pass over every token) is computed ONCE
    // per document, not once per join side
    val keys = docs.select(
      col(idCol).as("id"),
      bandKeys(NativeHash.minhashSignature(col(textCol), bands * r), bands, r).as("bks"))
      .persist()
    Caches.register(keys)
    val sigs = keys.select(col("id"), explode(col("bks")).as("bk"))
    sigs.as("a")
      .join(sigs.as("b"), col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates filtered by exact word-set jaccard
    * ≥ threshold. Output is verifiable against an all-pairs oracle because
    * the LSH stage has ~zero false-negative mass at useful thresholds.
    *
    * Canonicalization first: jaccard depends only on the word SET, so docs
    * with identical sets collapse to one representative before any pairwise
    * work — LSH, candidate dedup and verify all run on distinct sets, then
    * groups expand back to doc pairs (identical-set pairs are jaccard 1.0 by
    * construction). On boilerplate-heavy corpora this shrinks the quadratic
    * stage by the duplication factor squared.
    *
    * @param shingleN jaccard unit: 1 = word sets (default — order-blind),
    *                 n>1 = n-word shingle sets (word-order-sensitive, the
    *                 classic MinHash text-dedup configuration)
    * @param bands number of LSH bands; candidate recall = 1 − (1 − j^r)^bands
    * @param r minhash rows per band (r ≥ 2 keeps bucket sizes bounded under
    *          common-word skew — see [[minhashCandidates]])
    * @param broadcastThreshold max distinct word sets for the broadcast
    *                           all-pairs probe; above it the banded bucket
    *                           join runs. 0 forces the banded path — both
    *                           strategies produce the identical candidate
    *                           set, so results never depend on the route.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, bands: Int = 20, r: Int = 2, shingleN: Int = 1,
                   broadcastThreshold: Long = 8192L): DataFrame = {
    val units: Column => Column =
      if (shingleN <= 1) TextFunctions.wordSet
      else c => array_distinct(transform(TextFunctions.wordShingles(c, shingleN),
        // minhashSignature re-tokenizes on whitespace downstream — keep
        // each shingle ONE non-whitespace token; the U+0001 sentinel (vs
        // deleting spaces) keeps distinct shingles distinct ('a bc' and
        // 'ab c' must not both become 'abc')
        s => translate(s, " ", "\u0001")))
    val keyed = docs.select(
      col(idCol).as("id"),
      sort_array(units(col(textCol))).as("words"))
      .withColumn("set_key", md5(array_join(col("words"), " ")))
    // consumed by 5 downstream subtrees (reps, both LSH join sides, both
    // verify joins) — persist once or the canonicalization re-runs per use.
    // Size = one row per distinct word set (small by construction).
    val groups = keyed.groupBy("set_key")
      .agg(collect_list(col("id")).as("ids"), first(col("words")).as("words"), count(lit(1)).as("n"))
      .persist()
    Caches.register(groups)

    // Candidate strategy on the distinct sets, chosen like a planner would:
    // few reps → all-pairs broadcast join probing (size-ratio, band-key
    // overlap) INSIDE the join condition — the candidate stream stays slim
    // (two keys), no word arrays ride the O(n²) scan; many reps → banded
    // LSH bucket join. Both evaluate the same predicate ("∃ agreeing band
    // key" ∩ size-compatible), so the candidate set — and therefore the
    // verified result — never depends on the route taken. Word arrays join
    // back only for the verify step.
    val nReps = groups.count() // also materializes the persisted frame
    val broadcastable = nReps <= broadcastThreshold
    val candidates: DataFrame =
      if (broadcastable) {
        val sets = groups.select(col("set_key"), size(col("words")).as("sz"),
          bandKeys(NativeHash.minhashSignature(array_join(col("words"), " "), bands * r),
            bands, r).as("sig"))
        // probe side repartitioned so the O(nReps²) pair scan parallelizes
        // across all cores (the persisted groups frame is few-partition)
        val a = sets.select(col("set_key").as("id_a"), col("sz").as("sz_a"), col("sig").as("sig_a"))
          .repartition(docs.sparkSession.sparkContext.defaultParallelism)
        val b = sets.select(col("set_key").as("id_b"), col("sz").as("sz_b"), col("sig").as("sig_b"))
        a.join(broadcast(b),
            col("id_a") < col("id_b") &&
            // size-ratio prune (j ≥ t ⇒ min|set| ≥ t·max|set|): cheap int
            // compare eliminates pairs before the signature probe
            least(col("sz_a"), col("sz_b")).cast("double") >=
              lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double") &&
            arrays_overlap(col("sig_a"), col("sig_b")))
          .select("id_a", "id_b")
      } else {
        val reps = groups.select(col("set_key").as("id"), array_join(col("words"), " ").as("text"))
        minhashCandidates(reps, "id", "text", bands, r)
      }
    val maybeBroadcast: DataFrame => DataFrame = if (broadcastable) broadcast else identity
    val repPairs = candidates
      .join(maybeBroadcast(groups.select(col("set_key").as("id_a"),
        col("words").as("words_a"), col("ids").as("ids_a"))), "id_a")
      .join(maybeBroadcast(groups.select(col("set_key").as("id_b"),
        col("words").as("words_b"), col("ids").as("ids_b"))), "id_b")
      .filter(least(size(col("words_a")), size(col("words_b"))).cast("double") >=
        lit(threshold) * greatest(size(col("words_a")), size(col("words_b"))).cast("double"))
      // |A∪B| = |A|+|B|−|A∩B| — no union array; intersection size via the
      // native merge scan (words_* are sorted+distinct by canonicalization)
      .withColumn("__i", NativeHash.sortedIntersectSize(col("words_a"), col("words_b")))
      .withColumn("jaccard",
        col("__i").cast("double") /
          (size(col("words_a")) + size(col("words_b")) - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)

    // expand cross-group candidate pairs back to doc pairs
    val cross = repPairs
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("jaccard"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("jaccard"))
      .select(least(col("ia"), col("ib")).as("id_a"), greatest(col("ia"), col("ib")).as("id_b"), col("jaccard"))

    // identical-set doc pairs: jaccard exactly 1.0
    val intra = groups.filter(col("n") > 1)
      .select(explode(col("ids")).as("ia"), col("ids"))
      .select(col("ia"), explode(col("ids")).as("ib"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"), lit(1.0).as("jaccard"))

    if (threshold <= 1.0) cross.unionByName(intra) else cross
  }

  /** SimHash near-dup candidates: 64-bit fingerprints bucketed by 16-bit
    * quarters (any hamming-≤3 pair shares ≥1 identical quarter — pigeonhole;
    * cutoffs above 3 are best-effort recall),
    * verified by exact hamming distance.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val fp = docs.select(col(idCol).as("id"), NativeHash.simhash64(col(textCol)).as("sim"))
    val quarters = fp.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)), q =>
        call_function("shiftright", col("sim"), q * 16).bitwiseAND(lit(0xFFFFL)))).as(Seq("q", "chunk")))
    quarters.as("a")
      .join(quarters.as("b"),
        col("a.q") === col("b.q") && col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      // filter BEFORE distinct: the hamming cut runs map-side on the raw
      // bucket collisions; only surviving pairs pay the dedup shuffle
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    * threshold), brute force — the correctness baseline for semantic dedup.
    * One side broadcasts, the other streams repartitioned, so the O(n²)
    * pair scan parallelizes; cosine is the fused native expression
    * (bit-identical to the declarative fold and the DuckDB oracle).
    * At corpus scale use [[embedNearDupPairsLsh]].
    */
  def embedNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .repartition(vecs.sparkSession.sparkContext.defaultParallelism)
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cosine", NativeHash.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Scale path for embedding near-dup: random-hyperplane sign buckets make
    * the candidate join an equi-join — per-task pair counts are bucket-
    * bounded instead of corpus². High-cosine pairs agree on every
    * hyperplane sign with probability (1 − θ/π)^nPlanes, so recall < 1 by
    * construction (spec measures it; nPlanes = 0 degenerates to one bucket
    * = exact brute force).
    */
  def embedNearDupPairsLsh(vecs: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, nPlanes: Int = 8): DataFrame = {
    val keyed = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      graft.functions.VectorFunctions.lshBucket(col(vecCol), nPlanes).as("bucket"))
    keyed.as("a")
      .join(keyed.as("b"), col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cosine", NativeHash.cosine(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** Exact all-pairs n-gram/word jaccard over a bounded id range (the
    * correctness baseline the LSH paths approximate).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val words = docs.select(col(idCol).as("id"), TextFunctions.wordSet(col(textCol)).as("words"))
    words.as("a").join(words.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.words"), col("b.words"))).cast("double") /
          size(array_union(col("a.words"), col("b.words"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
