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
  * contributes none (its mass leaks, the "dropped dangling mass" PageRank
  * variant). Symmetrize edges upstream when degree-flow centrality over an
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
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
               dampingMillis: Int = 850,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingMillis >= 0 && dampingMillis <= 1000,
      s"dampingMillis must be in [0, 1000], got $dampingMillis")
    require(scale > 0 && scale <= Long.MaxValue / 1000,
      "scale must be positive and leave headroom for the damping multiply")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ew = e.join(deg, "src").persist()
    Caches.register(ew)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    Caches.register(nodes)
    val n = nodes.count() // the one driver scalar (control plane)
    if (n == 0) return nodes.withColumn("rank", lit(0L))
    val init = scale / n
    val base = ((1000L - dampingMillis) * init) / 1000L
    var ranks = nodes.withColumn("rank", lit(init))
    for (_ <- 0 until iters) {
      val contribs = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum("c").as("in"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingMillis * coalesce(in, 0L)) div 1000"))
            .as("rank"))
        .persist()
      Caches.register(next)
      ranks = next
    }
    ranks
  }
}
