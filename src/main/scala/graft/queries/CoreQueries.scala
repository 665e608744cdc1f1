package graft.queries

import graft.GraftSession.table
import graft.operators.{KeyedMergeSet, MapRule, Mapper}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries exercising the reference-surface operators
  * (SURVEY.md §2.1) and the analytics core (§2.2).
  *
  * Determinism contract with the DuckDB oracle:
  *  - money/qty aggregations run in exact DECIMAL and cast to DOUBLE at the
  *    end, so Spark's and DuckDB's summation order can't produce differing
  *    IEEE rounding;
  *  - every query ends in a total ORDER BY on a unique key;
  *  - collected arrays are sorted and joined to strings.
  */
object CoreQueries {

  // ---- §2.2 analytics core ----------------------------------------------

  /** TPC-H Q1-shaped pricing summary. One shuffle; partial agg map-side.
    *
    * All money arithmetic runs in exact DECIMAL (inputs are true 2-decimal
    * values stored as doubles; casting them to DECIMAL(.,2) is boundary-free)
    * so Spark and DuckDB produce bit-identical doubles at the end.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val ep   = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    val tax  = col("l_tax").cast("decimal(4,2)")
    val one  = lit(1).cast("decimal(4,2)")
    table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(ep).cast("double").as("sum_base_price"),
        sum(ep * (one - disc)).cast("double").as("sum_disc_price"),
        sum(ep * (one - disc) * (one + tax)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- §2.1 reference-surface -------------------------------------------

  /** Mapper + cleaners over `part` treated as a dirty supplier feed. */
  def qMapperClean(s: SparkSession, dir: String): DataFrame = {
    val rules = Seq(
      MapRule("part_key", "p_partkey"),
      MapRule("upc", "p_name"),
      MapRule("price", "p_retailprice"),
      MapRule("qty", "p_size"),
      MapRule("asin", "p_brand")
    )
    Mapper.mapColumns(table(s, dir, "part"), rules, supplierId = 77L, version = 3L)
      .orderBy("part_key")
  }

  val qMapperCleanSql: String =
    """SELECT p_partkey AS part_key,
      |  substr(regexp_replace(CAST(p_name AS VARCHAR), '[^a-zA-Zа-яА-Я0-9.]', '', 'g'), 1, 13) AS upc,
      |  COALESCE(TRY_CAST(regexp_extract(regexp_replace(regexp_replace(replace(CAST(p_retailprice AS VARCHAR), ',', '.'), '[^a-zA-Zа-яА-Я0-9.]', '', 'g'), '[^0-9.]', '', 'g'), '^([0-9]*\.?[0-9]*)', 1) AS DOUBLE), 0.0) AS price,
      |  COALESCE(TRY_CAST(regexp_replace(CAST(p_size AS VARCHAR), '[^0-9]', '', 'g') AS BIGINT), 0) AS qty,
      |  CASE WHEN regexp_matches(upper(trim(CAST(p_brand AS VARCHAR))), '^[A-Z0-9]{10}$')
      |       THEN upper(trim(CAST(p_brand AS VARCHAR))) END AS asin,
      |  CAST(77 AS BIGINT) AS supplier_id,
      |  CAST(3 AS BIGINT) AS version
      |FROM part
      |ORDER BY part_key""".stripMargin

  /** KeyedMergeSet collision rules over `orders` keyed by customer. */
  def qDedupeRules(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus", "o_orderpriority")
    KeyedMergeSet.dedupe(
      o,
      key = "o_custkey",
      rules = Map("o_totalprice" -> "max", "o_orderdate" -> "min", "o_orderstatus" -> "addArray"),
      orderCol = "o_orderkey"
    ).orderBy("o_custkey")
  }

  val qDedupeRulesSql: String =
    """SELECT o_custkey,
      |  max(o_totalprice) AS o_totalprice,
      |  min(o_orderdate) AS o_orderdate,
      |  array_to_string(list_sort(list(CAST(o_orderstatus AS VARCHAR))), ',') AS o_orderstatus,
      |  arg_max(o_orderpriority, o_orderkey) AS o_orderpriority
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** Flagship: the full reference pipeline (read → map/clean → keyed merge)
    * with `lineitem` standing in as the raw supplier feed.
    */
  def qSupplierAgg(s: SparkSession, dir: String): DataFrame = {
    val feed = table(s, dir, "lineitem")
      .withColumn("line_seq", col("l_orderkey") * 10 + col("l_linenumber"))
    val rules = Seq(
      MapRule("upc", "l_partkey"),
      MapRule("price", "l_extendedprice", Some("min")),
      MapRule("qty", "l_quantity", Some("max")),
      MapRule("status", "l_returnflag", Some("addArray")),
      MapRule("line_seq", "line_seq")
    )
    val mapped = Mapper.mapColumns(feed, rules, supplierId = 19L, version = 1L)
    KeyedMergeSet.dedupe(
      mapped,
      key = "upc",
      rules = rules.flatMap(r => r.merge.map(r.target -> _)).toMap,
      orderCol = "line_seq"
    ).orderBy("upc")
  }

  val qSupplierAggSql: String =
    """WITH feed AS (
      |  SELECT substr(regexp_replace(CAST(l_partkey AS VARCHAR), '[^a-zA-Zа-яА-Я0-9.]', '', 'g'), 1, 13) AS upc,
      |    COALESCE(TRY_CAST(regexp_extract(regexp_replace(regexp_replace(replace(CAST(l_extendedprice AS VARCHAR), ',', '.'), '[^a-zA-Zа-яА-Я0-9.]', '', 'g'), '[^0-9.]', '', 'g'), '^([0-9]*\.?[0-9]*)', 1) AS DOUBLE), 0.0) AS price,
      |    COALESCE(TRY_CAST(regexp_replace(CAST(l_quantity AS VARCHAR), '[^0-9]', '', 'g') AS BIGINT), 0) AS qty,
      |    l_returnflag AS status,
      |    CAST(19 AS BIGINT) AS supplier_id,
      |    CAST(1 AS BIGINT) AS version,
      |    l_orderkey*10 + l_linenumber AS line_seq
      |  FROM lineitem)
      |SELECT upc,
      |  min(price) AS price,
      |  max(qty) AS qty,
      |  array_to_string(list_sort(list(CAST(status AS VARCHAR))), ',') AS status,
      |  arg_max(supplier_id, line_seq) AS supplier_id,
      |  arg_max(version, line_seq) AS version
      |FROM feed
      |WHERE upc IS NOT NULL AND upc <> ''
      |GROUP BY upc
      |ORDER BY upc""".stripMargin
}
