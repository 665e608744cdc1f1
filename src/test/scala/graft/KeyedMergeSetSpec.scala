package graft

import graft.operators.{KeyedMergeSet, MapRule, Mapper}
import org.apache.spark.sql.Row

class KeyedMergeSetSpec extends SparkSpec {
  import spark.implicits._

  test("dedupe applies min/max/addArray/last-wins per field") {
    val df = Seq(
      ("u1", 10.0, 5L, "A", 1L),
      ("u1", 8.0, 9L, "B", 2L),
      ("", 1.0, 1L, "X", 3L), // empty key dropped
      ("u2", 3.0, 2L, "C", 4L)
    ).toDF("upc", "price", "qty", "status", "seq")

    val out = KeyedMergeSet.dedupe(
      df, "upc",
      Map("price" -> "min", "qty" -> "max", "status" -> "addArray"),
      orderCol = "seq"
    ).orderBy("upc").collect()

    assert(out.toSeq == Seq(Row("u1", 8.0, 9L, "A,B"), Row("u2", 3.0, 2L, "C")))
  }

  test("last-wins picks the row with highest orderCol") {
    val df = Seq(("k", "old", 1L), ("k", "new", 2L)).toDF("id", "v", "seq")
    val out = KeyedMergeSet.dedupe(df, "id", Map.empty, "seq").collect()
    assert(out.toSeq == Seq(Row("k", "new")))
  }

  test("mapper renames, cleans by target name, stamps constants, fails on missing") {
    val df = Seq(("0 1234-5678 90123", "12,5 uah", "3 pcs", "b00x4whp5e")).toDF("raw_upc", "raw_price", "raw_qty", "raw_asin")
    val rules = Seq(
      MapRule("upc", "raw_upc"), MapRule("price", "raw_price"),
      MapRule("qty", "raw_qty"), MapRule("asin", "raw_asin")
    )
    val out = Mapper.mapColumns(df, rules, 7L, 2L).collect()
    assert(out.toSeq == Seq(Row("0123456789012", 12.5, 3L, "B00X4WHP5E", 7L, 2L)))

    intercept[IllegalArgumentException] {
      Mapper.mapColumns(df, Seq(MapRule("x", "nope")), 1L, 1L)
    }
  }
}
