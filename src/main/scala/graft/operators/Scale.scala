package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew- and layout-management operators (SURVEY.md §4). AQE handles most
  * runtime skew; these are the explicit tools for when the skew is known
  * ahead of time (hot keys in a fact⋈fact join) or the layout should be
  * decided at write time (repeated co-located joins on one key).
  */
object Scale {

  /** Salted equi-join for skewed left (fact) sides: the left's hot keys
    * spread over `salts` sub-keys; the right side replicates each row
    * `salts` times. Correct for 1:N joins where the right is the "1" side.
    *
    * At 100 TB: a single hot key (null-ish UPCs, boilerplate fingerprints)
    * otherwise pins one reducer; salting caps per-task input at
    * |hot key| / salts at the cost of replicating the small side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn("__salt", (rand(seed = 7) * salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) && saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop(saltedRight(key)).drop("__salt")
  }

  /** Write a frame bucketed+sorted by the join key. Two tables bucketed the
    * same way join with ZERO exchange on either side — the layout-time
    * answer to "this key is joined every night".
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key (exchange-free when both
    * sides were written with [[writeBucketed]] and the same bucket count).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
