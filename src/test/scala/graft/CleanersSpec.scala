package graft

import graft.functions.Cleaners
import org.apache.spark.sql.functions.col

class CleanersSpec extends SparkSpec {
  import spark.implicits._

  private def run(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column, vals: String*): Seq[Any] =
    vals.toDF("v").select(f(col("v"))).collect().toSeq.map(r => r.get(0))

  test("cleanString strips everything but letters/digits/dot") {
    assert(run(Cleaners.cleanString _, "a b-c_1.2!", "Ценa 12,5") == Seq("abc1.2", "Ценa125"))
  }

  test("cleanUpc truncates to 13") {
    assert(run(Cleaners.cleanUpc _, " 0-12345-67890-5 X") == Seq("012345678905X"))
  }

  test("cleanInteger keeps digits, empty → 0") {
    assert(run(Cleaners.cleanInteger _, "qty: 1,234 pcs", "none", "17.0") == Seq(1234L, 0L, 170L))
  }

  test("cleanFloat PHP floatval semantics") {
    assert(run(Cleaners.cleanFloat _, "1 234,56 uah", "1.2.3", "junk", ".5") == Seq(1234.56, 1.2, 0.0, 0.5))
  }

  test("asinValidate accepts exactly 10 alnum") {
    assert(run(Cleaners.asinValidate _, " b00x4whp5e ", "bad asin", "B00X4WHP5E1") == Seq("B00X4WHP5E", null, null))
  }
}
