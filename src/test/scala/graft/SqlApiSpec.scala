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
}
