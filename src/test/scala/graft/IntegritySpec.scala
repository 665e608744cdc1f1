package graft

import org.apache.spark.sql.functions._

/** Referential-integrity audit (`Integrity.fkAudit` / `qIntegrity`):
  * planted orphans and null keys land in the right cells; the real star
  * is clean end-to-end.
  */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("planted orphans, null keys, and repeat orphan keys are counted per cell") {
    // fact: 3 rows on pk 1, one null key, orphan key 99 twice, orphan 98 once
    val fact = Seq(Some(1L), Some(1L), Some(1L), None,
      Some(99L), Some(99L), Some(98L)).toDF("fk")
    val dim = Seq(1L, 2L).toDF("pk")
    val r = operators.Integrity.fkAudit(fact, "fk", dim, "pk", "e").collect().head
    assert(r.getString(0) === "e")
    assert(r.getLong(1) === 7L) // n_rows
    assert(r.getLong(2) === 1L) // n_null_fk
    assert(r.getLong(3) === 3L) // n_orphan_rows (99 x2 + 98 x1)
    assert(r.getLong(4) === 2L) // n_orphan_keys (99, 98)
  }

  test("the real star audits clean, with n_rows matching the fact counts") {
    val rows = queries.SourceQueries.qIntegrity(spark, sfDir).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getLong(2) === 0L, s"${r.getString(0)} null keys")
      assert(r.getLong(3) === 0L, s"${r.getString(0)} orphan rows")
      assert(r.getLong(4) === 0L, s"${r.getString(0)} orphan keys")
    }
    val byEdge = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val ord = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(byEdge("lineitem.l_orderkey->orders") === li)
    assert(byEdge("orders.o_custkey->customer") === ord)
  }
}
