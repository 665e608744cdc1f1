package graft

import graft.functions.Cleaners
import graft.operators.KeyedMergeSet
import org.apache.spark.sql.functions.col
import scala.util.Random

/** Randomized-input tests (seeded): the distributed operators against
  * direct in-memory models of the reference's PHP semantics
  * (/root/reference/src/Service/Mapper/Mapper.php:21-52,
  * /root/reference/src/Model/DataSetCollection.php:26-63).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // in-memory models of the PHP cleaners
  private def phpCleanString(s: String): String =
    s.replaceAll("[^a-zA-Zа-яА-Я0-9.]", "")
  private def phpCleanUpc(s: String): String =
    phpCleanString(s).take(13)
  private def phpCleanInteger(s: String): Long = {
    val d = s.replaceAll("[^0-9]", "")
    if (d.isEmpty) 0L else try d.toLong catch { case _: Exception => 0L }
  }
  private def phpCleanFloat(s: String): Double = {
    val cleaned = phpCleanString(s.replace(",", ".")).replaceAll("[^0-9.]", "")
    val m = "^([0-9]*\\.?[0-9]*)".r.findFirstMatchIn(cleaned).map(_.group(1)).getOrElse("")
    if (m.isEmpty || m == ".") 0.0 else try m.toDouble catch { case _: Exception => 0.0 }
  }

  private val alphabet =
    "abcXYZ0123456789 ..,,--__!!##$$Ценай\t€" // letters, digits, junk, cyrillic, unicode

  private def messy(r: Random): String =
    Seq.fill(r.nextInt(40))(alphabet(r.nextInt(alphabet.length))).mkString

  test("native cleaners are bit-identical to the declarative regex twins") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val alphabet = "0123456789abcXYZ.,-– кйч$%  \t"
    val strs = Seq.fill(500)((0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString) :+
      "9223372036854775808" :+ "1.2.3" :+ "," :+ "." :+ ""
    val rows = strs.toDF("v").select(
      Cleaners.cleanUpc(col("v")).as("nu"), Cleaners.declarativeCleanUpc(col("v")).as("du"),
      Cleaners.cleanInteger(col("v")).as("ni"), Cleaners.declarativeCleanInteger(col("v")).as("di"),
      Cleaners.cleanFloat(col("v")).as("nf"), Cleaners.declarativeCleanFloat(col("v")).as("df")
    ).collect()
    rows.zip(strs).foreach { case (r, s) =>
      assert(r.getString(0) == r.getString(1), s"upc '$s'")
      assert(r.getLong(2) == r.getLong(3), s"int '$s'")
      assert(r.getDouble(4) == r.getDouble(5), s"float '$s'")
    }
  }

  test("cleaners match the PHP model on 500 random messy strings") {
    val r = new Random(42)
    val strs = Seq.fill(500)(messy(r))
    val got = strs.toDF("v").select(
      Cleaners.cleanUpc(col("v")),
      Cleaners.cleanInteger(col("v")),
      Cleaners.cleanFloat(col("v"))
    ).collect()
    strs.zip(got).foreach { case (s, row) =>
      assert(row.getString(0) == phpCleanUpc(s), s"cleanUpc(${s.take(40)})")
      assert(row.getLong(1) == phpCleanInteger(s), s"cleanInteger($s)")
      assert(row.getDouble(2) == phpCleanFloat(s), s"cleanFloat($s)")
    }
  }

  test("keyed merge matches an in-memory DataSetCollection fold on random data") {
    val r = new Random(7)
    for (_ <- 1 to 20) {
      val n = 1 + r.nextInt(60)
      val data = Seq.tabulate(n) { i =>
        ("abcd" (r.nextInt(4)).toString, math.rint(r.nextDouble() * 200 - 100), i.toLong)
      }
      val got = KeyedMergeSet.dedupe(
        data.toDF("k", "v", "seq"), "k", Map("v" -> "min"), "seq")
        .collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
      val expected = data.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).min }
      assert(got == expected)
    }
  }

  test("last-wins matches fold order under shuffled input") {
    val r = new Random(13)
    val data = r.shuffle(Seq.tabulate(50)(i => ("k", s"v$i", i.toLong)))
    val got = KeyedMergeSet.dedupe(data.toDF("k", "v", "seq"), "k", Map.empty, "seq").collect()
    assert(got.head.getString(1) == "v49") // highest seq wins regardless of physical order
  }
}
