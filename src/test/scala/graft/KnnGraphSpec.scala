package graft

import org.apache.spark.sql.functions._

/** k-NN graph (`Ann.knnGraph`): driver model over the real embeddings
  * table — same bucket keys, same candidate rule, same left-to-right
  * cosine fold, same (cosine desc, id) tie-break.
  */
class KnnGraphSpec extends SparkSpec {

  test("graph matches a driver model built from the same bucket keys") {
    val nTables = 2; val planes = 4; val k = 5
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val rows = base.select(col("vec_id"),
        functions.VectorFunctions.lshKeys(col("embedding"), nTables, planes).as("ks"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSet, r.getSeq[Float](2).toArray))
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
      var na = 0.0; i = 0; while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
      var nb = 0.0; i = 0; while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val model = rows.flatMap { case (vid, ks, v) =>
      rows.filter { case (nid, ks2, _) => nid != vid && ks.exists(ks2.contains) }
        .map { case (nid, _, nv) => (nid, cosine(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(k).zipWithIndex
        .map { case ((nid, c), i) => (vid, nid, c, i + 1) }
    }.toSet
    val got = operators.Ann.knnGraph(base, "vec_id", "embedding", k, nTables, planes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === model)
    assert(got.nonEmpty)
    // every vector with at least one collision appears as a source
    val expectedSources = model.map(_._1)
    assert(got.map(_._1) === expectedSources)

    // label purity over the same model graph
    val labels = base.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byLabel = model.groupBy(e => labels(e._1)).map { case (l, es) =>
      val matches = es.count(e => labels(e._2) == l)
      (l, es.map(_._1).size.toLong, es.size.toLong, matches.toLong,
        matches.toDouble / es.size)
    }.toSet
    val gotPurity = queries.LlmQueries.qLabelPurity(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(gotPurity === byLabel)
    gotPurity.foreach { case (_, _, _, _, p) => assert(p >= 0.0 && p <= 1.0) }
  }

  test("prod purity report aggregates the prod (8x16) graph exactly") {
    // the production purity numbers must be the per-label aggregation of
    // the PRODUCTION graph (q_knn_graph_prod's edges), not the 2x4 one
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = queries.LlmQueries.qKnnGraphProd(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val model = edges.groupBy(e => labels(e._1)).map { case (l, es) =>
      val matches = es.count(e => labels(e._2) == l)
      (l, es.map(_._1).distinct.size.toLong, es.size.toLong, matches.toLong,
        matches.toDouble / es.size)
    }.toSet
    val got = queries.LlmQueries.qLabelPurityProd(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got === model)
    assert(got.nonEmpty)
  }

  test("prod posture (8x16): planted twins collide in every table and rank first") {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").orderBy("vec_id").limit(20)
    val twins = base.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(twins)
    val g = operators.Ann.knnGraph(corpus, "vec_id", "embedding", k = 1,
        nTables = 8, planesPerTable = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical vectors share all 8 bucket keys, so every original's top
    // neighbor is its twin (cosine ~1 dwarfs all others) — recall 20/20
    val ids = base.collect().map(_.getLong(0))
    assert(ids.length === 20)
    ids.foreach { id =>
      assert(g(id) === id + 100000L, s"original $id")
      assert(g(id + 100000L) === id, s"twin of $id")
    }
  }
}
