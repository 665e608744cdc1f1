package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics in the DataFrame algebra — the Pregel shape
  * (repeated sparse matrix-vector product = join ranks to edges, aggregate
  * contributions per destination) without a graph runtime.
  *
  * PageRank here is EXACT-INTEGER: ranks live in fixed-point units of
  * `scale` total mass, contributions and the damping mix use floor
  * division, so the result is a pure function of the edge set —
  * partitioning-independent, replayable in SQL, and comparable across
  * engines bit for bit. (Float PageRank differs run to run for the same
  * reason float k-means does: sum order.) The floor-division contract IS
  * the published semantics of this operator, not an approximation of some
  * float truth.
  *
  * At 100 TB: per iteration one equi-join of the slim (src, dst, deg) edge
  * frame against the (node, rank) frame and one map-side-combined sum per
  * destination — both shuffle on node keys and AQE-coalesce; the edge frame
  * is persisted once with out-degrees precomputed. Nothing node- or
  * edge-sized ever reaches the driver (only the node COUNT, one scalar).
  * Iteration count is fixed, like [[KMeans]] — convergence detection would
  * make run time data-dependent.
  *
  * Dangling nodes (out-degree 0) never appear as a source here: callers
  * pass directed edges and the operator ranks only nodes incident to an
  * edge; a node with in-edges but no out-edges keeps receiving mass but
  * contributes none — by default its mass leaks (the "dropped dangling
  * mass" PageRank variant); `redistributeDangling = true` selects the
  * standard uniform-redistribution variant (mass conserved up to floor
  * residue). Symmetrize edges upstream when degree-flow centrality over an
  * undirected graph is wanted.
  */
object Graph {

  /** Connected components over an undirected edge set — the general
    * per-node form of the cluster-materialization step every pairwise
    * dedup family ends in (near-dup pairs → components → keep one per
    * component; [[graft.operators.Dedup]]'s `ccMinWinners` is the
    * winners-only sibling and this operator follows its distributed
    * route exactly). Returns (node, comp) for every node incident to an
    * edge, comp = the component's MINIMUM node id — the true transitive
    * closure, a pure function of the edge set. Edges are symmetrized
    * here; direction is ignored.
    *
    * Each round does (1) a neighbor-min — m(v) = min(l(v), min over
    * neighbors' labels) — and (2) pointer halving — adopt the label OF
    * the adopted label (labels are always node ids, so the lookup always
    * hits). Plain propagation needs O(diameter) rounds; the halving step
    * collapses label chains geometrically, the pointer-jumping O(log
    * diameter) bound. Rounds run until a fixed point (changed == 0 — one
    * control-plane scalar per round), so the output is the exact
    * components, and the SQL oracle replays the measured round count for
    * its corpus.
    *
    * At 100 TB: per round one equi-join of the slim symmetric edge frame
    * (persisted once) against the (node, label) frame, one map-side-
    * combined min, and one label-keyed self-join — all shuffle on node
    * keys and AQE-coalesce. Each round `localCheckpoint`s the label
    * frame: lineage stays constant-depth (an unbounded iterative plan
    * tree is both an optimizer-time and a stack-depth bomb) and
    * superseded blocks are released by the ContextCleaner. Nothing
    * graph-sized ever reaches the driver.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 50): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    Caches.register(e)
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("comp")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val byNbr = e
        .join(labels.select(col("node").as("src"), col("comp").as("slbl")), "src")
        .groupBy("dst").agg(min(col("slbl")).as("nlbl"))
        .withColumnRenamed("dst", "node")
      val step1 = labels.join(byNbr, Seq("node"), "left")
        .select(col("node"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nlbl"), col("comp"))).as("l1"))
      val step2 = step1
        .join(labels.select(col("node").as("ln"), col("comp").as("llbl")),
          step1("l1") === col("ln"), "left")
        .select(col("node"), col("old"),
          least(col("l1"), coalesce(col("llbl"), col("l1"))).as("comp"))
        .localCheckpoint()
      changed = step2.filter(col("comp") =!= col("old")).count()
      labels = step2.select("node", "comp")
      rounds += 1
    }
    require(changed == 0,
      s"connectedComponents: min-label propagation did not converge in $maxRounds rounds")
    labels
  }

  /** Fixed-point PageRank: returns (node, rank) after `iters` rounds, rank
    * in units of `scale` total initial mass, damping = `dampingMillis`/1000.
    *
    * Dangling nodes (in-edges but no out-edges): by default their received
    * mass LEAKS each round (the "dropped dangling mass" variant — the
    * documented published semantics of this operator's default).
    * `redistributeDangling = true` selects the standard textbook variant
    * instead: each round the dangling nodes' total mass is divided
    * uniformly (floor) across all nodes inside the damping term —
    * next(v) = base + d·(in(v) + D div n) div 1000 — so total mass is
    * conserved up to floor residue. The dangling total is one slim
    * anti-join + sum per round (a control-plane scalar, like the node
    * count).
    *
    * Lineage stays BOUNDED-depth via `localCheckpoint` every
    * `checkpointEvery` rounds (a 50-round persist-only loop grows the
    * logical plan linearly — optimizer time and stack depth both pay per
    * round), but NOT every round: a checkpoint is an eager
    * materialization, and checkpointing each of the registered 3 rounds
    * measured 8–9 s cold at sf0.1 vs ~0.5 s with the rounds pipelined
    * into one job (the r9 lesson: bound lineage at K, don't flatten it
    * to 1). The `redistributeDangling` variant checkpoints every round
    * regardless — its per-round driver scalar materializes the chain
    * anyway, and an unpinned tail would recompute O(iters²).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
               dampingMillis: Int = 850,
               scale: Long = 1000000000000L,
               redistributeDangling: Boolean = false,
               checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingMillis >= 0 && dampingMillis <= 1000,
      s"dampingMillis must be in [0, 1000], got $dampingMillis")
    require(scale > 0 && scale <= Long.MaxValue / 1000,
      "scale must be positive and leave headroom for the damping multiply")
    // e persisted (r12): deg, ew and BOTH legs of the nodes union read it —
    // unpersisted, the caller's edge derivation (often a join + distinct)
    // re-executed up to 4x per run
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct().persist()
    Caches.register(e)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ew = e.join(deg, "src").persist()
    Caches.register(ew)
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct().persist()
    Caches.register(nodes)
    val n = nodes.count() // the one driver scalar (control plane)
    if (n == 0) return nodes.withColumn("rank", lit(0L))
    val init = scale / n
    val base = ((1000L - dampingMillis) * init) / 1000L
    var ranks = nodes.withColumn("rank", lit(init))
    if (redistributeDangling) ranks = ranks.localCheckpoint()
    for (i <- 0 until iters) {
      // per-node share of the dangling mass this round (0 when leaking):
      // dangling = nodes with no out-edge = ranks minus deg's src set
      val share =
        if (!redistributeDangling) 0L
        else Math.floorDiv(
          ranks.join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
            .agg(coalesce(sum("rank"), lit(0L))).head.getLong(0), n)
      val contribs = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum("c").as("in"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampingMillis * (coalesce(in, 0L) + $share)) div 1000"))
            .as("rank"))
      if (redistributeDangling || (i + 1) % checkpointEvery == 0)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** PERSONALIZED PageRank: random-walk-with-restart relevance to a seed
    * set — "what is close to THESE nodes" (seeded curation: expand a
    * trusted domain list, find accounts trading like a known cohort).
    * Same exact-integer contract as [[pageRank]], with the uniform
    * restart vector replaced by mass `scale div |seeds|` on each seed:
    * next(v) = [v ∈ seeds]·((1000−d)·init) div 1000 + (d·in(v)) div 1000.
    * Mass reaching dangling ends leaks (the [[pageRank]] default,
    * documented there). Seeds not present in the graph contribute
    * nothing — callers own seed validation.
    *
    * Scale shape identical to [[pageRank]]: one slim edge⋈rank join per
    * round, map-side-combined contribution sums, the seed test is a
    * literal `isin` in the projection, lineage bounded by
    * `checkpointEvery`.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: Seq[String], iters: Int,
                           dampingMillis: Int = 850,
                           scale: Long = 1000000000000L,
                           checkpointEvery: Int = 8): DataFrame = {
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingMillis >= 0 && dampingMillis <= 1000,
      s"dampingMillis must be in [0, 1000], got $dampingMillis")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    // e persisted (r12): deg, ew and BOTH legs of the nodes union read it —
    // unpersisted, the caller's edge derivation (often a join + distinct)
    // re-executed up to 4x per run
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct().persist()
    Caches.register(e)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ew = e.join(deg, "src").persist()
    Caches.register(ew)
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct().persist()
    Caches.register(nodes)
    val init = scale / seeds.length
    val isSeed = col("node").isin(seeds: _*)
    val seedBase = ((1000L - dampingMillis) * init) / 1000L
    var ranks = nodes.select(col("node"),
      when(isSeed, lit(init)).otherwise(lit(0L)).as("rank"))
    for (i <- 0 until iters) {
      val contribs = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum("c").as("in"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(isSeed, lit(seedBase)).otherwise(lit(0L)) +
            expr(s"($dampingMillis * coalesce(in, 0L)) div 1000")).as("rank"))
      if ((i + 1) % checkpointEvery == 0) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Per-node triangle counts over an undirected simple graph — the
    * clustering-structure primitive (local clustering coefficient, spam/
    * community detection over link graphs; the co-order graph query uses it
    * to find tightly-coupled supplier groups). Returns (node, deg, n_tri)
    * for every node incident to an edge; `deg` is the undirected degree,
    * `n_tri` the number of triangles the node participates in (0 included).
    *
    * The RESULT is a pure function of the edge set — direction and
    * duplicate edges are erased by canonicalization, self-loops dropped —
    * so the SQL oracle can replay it with the naive a<b<c three-way join.
    * The PLAN is the degree-ordered wedge enumeration (the MapReduce
    * triangle-counting bound of Suri & Vassilvitskii, WWW'11): orient every
    * edge from the (deg, id)-smaller endpoint to the larger, enumerate
    * wedges only at each edge's SMALLER endpoint, and close them against
    * the oriented edge set. Out-degree under this orientation is O(√m) on
    * any graph, so wedge count is Σ d_out² ≤ m^{3/2} — the naive
    * enumeration is Σ d² which a single celebrity node (every crawl graph
    * has one) turns quadratic.
    *
    * At 100 TB: three slim shuffles build the oriented frame (degree agg +
    * two key joins); the wedge self-join and the closing join shuffle on
    * node keys and AQE-coalesce; per-node counts are one map-side-combined
    * sum. Nothing graph-sized reaches the driver.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct().persist()
    Caches.register(und)
    val deg = und.select(col("u").as("node")).union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg")).persist()
    Caches.register(deg)
    // orient u→v when (deg(u), u) < (deg(v), v): a total order, so the
    // oriented graph is a DAG and every triangle closes exactly once
    val lowFirst = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val oriented = lowFirst.select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"),
        least(col("du"), col("dv")).as("da"),
        greatest(struct(col("du").as("d"), col("u").as("n")),
                 struct(col("dv").as("d"), col("v").as("n")))
          .getField("d").as("db"))
      .persist()
    Caches.register(oriented)
    // wedges at the apex a: unordered out-neighbor pairs (b, c) with
    // (db, b) < (dc, c) in the SAME total order, so the closing edge is
    // exactly the oriented b→c
    val w1 = oriented.select(col("a"), col("b"), col("db"))
    val w2 = oriented.select(col("a").as("a2"), col("b").as("c"), col("db").as("dc"))
    val wedges = w1.join(w2,
      col("a") === col("a2") &&
        (col("db") < col("dc") || (col("db") === col("dc") && col("b") < col("c"))))
      .select(col("a"), col("b"), col("c"))
    // persisted: the three-way role union below reads the closed triangles
    // once per role — without the barrier the wedge-closing join (the
    // dominant m^1.5 stage) would re-execute up to 3×
    val tris = wedges.join(oriented.select(col("a").as("b"), col("b").as("c")),
      Seq("b", "c")).persist()
    Caches.register(tris)
    val perNode = tris.select(col("a").as("node"))
      .union(tris.select(col("b").as("node")))
      .union(tris.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** k-CORE decomposition membership: the maximal subgraph where every
    * node keeps degree ≥ k — the standard "dense nucleus" filter (spam
    * farms, tightly-coupled supplier rings, community cores; Seidman 1983,
    * the public formulation). Returns (node, deg) for the members, deg =
    * the node's WITHIN-CORE degree.
    *
    * Peeling: repeatedly delete nodes with current degree < k; the fixed
    * point is the k-core (order of deletion provably doesn't matter, so
    * the result is a pure function of the edge set). Each round is one
    * semi-join of the persisted symmetric edge frame against the alive
    * set (both endpoints), a map-side-combined degree count, and a
    * filter; the alive frame `localCheckpoint`s per round (constant-depth
    * lineage, the [[connectedComponents]] contract) and convergence is
    * one control-plane scalar (removed == 0). Extra peel rounds past the
    * fixed point are no-ops — which is what lets a fixed-unroll SQL
    * replay gate a run-to-convergence operator.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    val e = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    Caches.register(e)
    var alive = e.select(col("src").as("node")).distinct().localCheckpoint()
    var removed = 1L
    var rounds = 0
    while (removed > 0 && rounds < maxRounds) {
      val degNow = e
        .join(alive.select(col("node").as("src")), "src")
        .join(alive.select(col("node").as("dst")), "dst")
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .withColumnRenamed("src", "node")
      val next = degNow.filter(col("deg") >= k).localCheckpoint()
      removed = alive.count() - next.count()
      alive = next.select("node", "deg").localCheckpoint()
      rounds += 1
    }
    require(removed == 0, s"kCore: peeling did not converge in $maxRounds rounds")
    alive
  }

  /** Multi-source BFS hop distance, bounded at `rounds` hops: (node, hops)
    * for every node reachable from the seed set within `rounds` edges —
    * the neighborhood-expansion primitive (fraud blast radius, "expand a
    * trusted domain list by ≤ 3 links", contamination spread). Fixed
    * round count like [[pageRank]] — run time is not data-dependent, and
    * hop distances already found are final (BFS frontier monotonicity),
    * so round r output = exact min-hop distance for every node within r.
    *
    * Per round: one equi-join of the frontier against the persisted
    * symmetric edge frame + a min agg merged with the settled set —
    * work ∝ frontier out-degree, never graph². Lineage bounded per round
    * by `localCheckpoint` (the distance frame is read twice per round).
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: Seq[String], rounds: Int): DataFrame = {
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    Caches.register(e)
    // seed the round-0 frame from the literal seed list, NOT the
    // edge-incident node set: a seed with no edges is still at distance 0
    // ("every node reachable from the seed set" includes the seeds)
    import edges.sparkSession.implicits._
    var dist = seeds.distinct.toDF("node")
      .select(col("node"), lit(0L).as("hops")).localCheckpoint()
    for (_ <- 0 until rounds) {
      val nbr = e.join(dist.select(col("node").as("src"), col("hops")), "src")
        .select(col("dst").as("node"), (col("hops") + 1L).as("hops"))
      dist = dist.unionByName(nbr)
        .groupBy("node").agg(min("hops").as("hops"))
        .localCheckpoint()
    }
    dist
  }

  /** HITS hubs & authorities (Kleinberg 1999, the public formulation) over
    * a DIRECTED edge set, exact-integer: scores live in fixed-point units
    * and each half-step renormalizes to total mass `scale` by floor
    * division — sum order can't move a bit, so the result is a pure
    * function of the edge set (the same argument as [[pageRank]]'s
    * floor-division contract). auth(v) = Σ hub(u) over in-edges, then
    * auth ← auth·scale div Σauth; hub(u) = Σ auth(v) over out-edges, then
    * the same normalization. Returns (node, hub, auth) for every node.
    *
    * Overflow headroom: post-normalization scores sum to ≤ scale, so a
    * raw half-step value is ≤ scale and the normalization multiply is
    * bounded by scale² — keep scale ≤ 3e9 to stay inside Long.
    *
    * Per round: two slim edge⋈score joins + map-side-combined sums; the
    * two normalization totals are control-plane scalars (one driver
    * `first()` each, like [[connectedComponents]]' changed-count).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
           scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale > 0 && scale <= 3000000000L, s"scale out of Long headroom: $scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    Caches.register(e)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    Caches.register(nodes)
    val n = nodes.count()
    if (n == 0) return nodes.select(col("node"), lit(0L).as("hub"), lit(0L).as("auth"))
    var hub = nodes.select(col("node"), lit(scale / n).as("s")).localCheckpoint()
    var auth = hub
    for (_ <- 0 until iters) {
      val rawA = nodes.join(
          e.join(hub.select(col("node").as("src"), col("s")), "src")
            .groupBy(col("dst").as("node")).agg(sum("s").as("raw")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("raw"), lit(0L)).as("raw"))
        .localCheckpoint()
      val totA = math.max(1L, rawA.agg(sum("raw")).first().getLong(0))
      // auth/hub are one-projection derivatives of the checkpointed raw
      // frames — re-checkpointing them would pay a second eager
      // materialization per half-step for depth-1 lineage
      auth = rawA.select(col("node"), expr(s"(raw * $scale) div $totA").as("s"))
      val rawH = nodes.join(
          e.join(auth.select(col("node").as("dst"), col("s")), "dst")
            .groupBy(col("src").as("node")).agg(sum("s").as("raw")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("raw"), lit(0L)).as("raw"))
        .localCheckpoint()
      val totH = math.max(1L, rawH.agg(sum("raw")).first().getLong(0))
      hub = rawH.select(col("node"), expr(s"(raw * $scale) div $totH").as("s"))
    }
    nodes
      .join(hub.withColumnRenamed("s", "hub"), "node")
      .join(auth.withColumnRenamed("s", "auth"), "node")
  }
}
