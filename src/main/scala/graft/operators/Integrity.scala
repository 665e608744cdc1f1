package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the load-gate report an ETL run publishes
  * before downstream joins trust a feed (the reference validates per-row
  * shape in its mappers; this is the cross-TABLE contract those mappers
  * cannot see: every foreign key lands on a primary key).
  *
  * Per FK edge `fact.fk → dim.pk`: total fact rows, rows with a NULL key
  * (excused from the FK check, reported separately), orphan rows (non-null
  * key with no matching pk) and distinct orphan keys.
  *
  * Scale shape: the fact table collapses to per-key counts FIRST (one
  * map-side-combined aggregation — the only corpus-sized pass), then the
  * key-sized frame left-joins the dim's pk projection and ONE aggregation
  * produces the report row. Dims broadcast when small (Spark's threshold
  * decides); the fact's row bodies never shuffle. A 10¹⁰-row fact with
  * 10⁷ distinct keys pays one combine-heavy shuffle of 10⁷ slim rows per
  * audited edge — never a row-level join.
  */
object Integrity {

  /** One audited edge: a 1-row frame labeled `edge`. `dim(pkCol)` must be
    * unique (it is the primary key — duplicates would double-count fact
    * rows through the left join).
    */
  def fkAudit(fact: DataFrame, fkCol: String, dim: DataFrame, pkCol: String,
              edge: String): DataFrame = {
    val keyCounts = fact.groupBy(col(fkCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val joined = keyCounts.join(dim.select(col(pkCol).as("__pk")),
      col("__k") === col("__pk"), "left")
    val orphan = col("__k").isNotNull && col("__pk").isNull
    joined.agg(
        sum(col("__c")).as("n_rows"),
        sum(when(col("__k").isNull, col("__c")).otherwise(lit(0L))).as("n_null_fk"),
        sum(when(orphan, col("__c")).otherwise(lit(0L))).as("n_orphan_rows"),
        count(when(orphan, lit(1))).as("n_orphan_keys"))
      .select(lit(edge).as("edge"), col("n_rows"), col("n_null_fk"),
        col("n_orphan_rows"), col("n_orphan_keys"))
  }

  /** Audit a set of edges into one report, ordered by edge name. */
  def audit(edges: Seq[(DataFrame, String, DataFrame, String, String)]): DataFrame =
    edges.map { case (fact, fk, dim, pk, name) => fkAudit(fact, fk, dim, pk, name) }
      .reduce(_ unionByName _)
      .orderBy("edge")
}
