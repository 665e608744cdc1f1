package graft

class SqlApiSpec extends SparkSpec {

  test("spark.sql works over registered tables and graft_* native functions") {
    GraftSession.registerTables(spark, sfDir)
    val agg = spark.sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1""").collect()
    assert(agg.nonEmpty && agg.map(_.getLong(1)).sum == 6000L)

    val fp = spark.sql(
      """SELECT doc_id, graft_simhash64(text) AS sim,
        |       graft_minhash(text, 4) AS sig
        |FROM documents WHERE doc_id < 3 ORDER BY doc_id""".stripMargin).collect()
    assert(fp.length == 3 && fp.forall(_.getSeq[Long](2).length == 4))

    val morris = spark.sql(
      """SELECT inline(graft_morris_parse(
        |  '<r><available><gtin>1</gtin><qty>2</qty><detail><price>3.5</price></detail></available></r>'))""".stripMargin
    ).collect()
    assert(morris.head.getString(0) == "1" && morris.head.getDouble(2) == 3.5)
  }

  test("native graft_minhash is bit-identical to the declarative xxhash64 twin") {
    import org.apache.spark.sql.functions.col
    GraftSession.registerTables(spark, sfDir)
    val both = spark.table("documents").limit(50).select(
      graft.plans.NativeHash.minhashSignature(col("text"), 8).as("native"),
      graft.functions.TextFunctions.minhashSignature(col("text"), 8).as("decl"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("graft_cosine on non-float arrays is an analysis error, not garbage") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(array(1.0D, 2.0D), array(1.0D, 2.0D))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
    // and the legit float-array form still evaluates
    val ok = spark.sql(
      "SELECT graft_cosine(array(float(1), float(0)), array(float(1), float(0)))").collect()
    assert(math.abs(ok.head.getDouble(0) - 1.0) < 1e-12)
  }
}
