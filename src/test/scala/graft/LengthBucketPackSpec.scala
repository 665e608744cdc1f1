package graft

import graft.functions.{TextFunctions => TF}
import graft.queries.LlmQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batching economics (`q_length_bucket_pack`): the
  * distributed globalRowNumber route against a plain window-function
  * reference, and the economics invariants (sorted batching never pads
  * more; token totals strategy-invariant).
  */
class LengthBucketPackSpec extends SparkSpec {

  test("globalRowNumber route ≡ single-window reference; sorted saves padding") {
    val got = LlmQueries.qLengthBucketPack(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TF.tokenCountBpe(col("text")).cast("long").as("len"))
      .filter(col("len") > 0)
    def ref(order: Seq[org.apache.spark.sql.Column]) = {
      val r = d.withColumn("rn", row_number().over(Window.orderBy(order: _*)))
        .withColumn("batch_id", expr("(rn - 1) div 32"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n"), sum("len").as("tok"), max("len").as("mx"))
        .agg(count(lit(1)), sum("tok"), sum(col("mx") * col("n")))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val (abat, atok, apad) = ref(Seq(col("doc_id")))
    val (sbat, stok, spad) = ref(Seq(col("len").desc, col("doc_id")))

    assert(got("arrival") == ((abat, atok, apad, apad - atok, (apad - atok) * 1000000L / apad)))
    assert(got("sorted") == ((sbat, stok, spad, spad - stok, (spad - stok) * 1000000L / spad)))
    assert(atok == stok && abat == sbat, "token/batch totals must be strategy-invariant")
    assert(got("sorted")._4 <= got("arrival")._4, "sorted batching must not pad more")
    assert(got("sorted")._4 < got("arrival")._4,
      "on a length-skewed corpus sorted batching should strictly save")
  }
}
