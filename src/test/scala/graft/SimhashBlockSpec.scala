package graft

import graft.operators.Dedup
import graft.plans.NativeHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The simhash ≥10⁹-doc scale path: 6-block C(6,3) bucket keys must return
  * exactly what the 16-bit-quarter path and the all-pairs scan return —
  * both bucketings are pigeonhole-complete at hamming ≤ 3, so this is an
  * equality, not a recall estimate.
  */
class SimhashBlockSpec extends SparkSpec {

  /** Random docs + exact copies (hamming 0) + long docs with one word
    * swapped (small nonzero hamming) so the ≤3 cut has real members of
    * every kind.
    */
  private def corpus(): DataFrame = {
    val rnd = new scala.util.Random(47)
    val vocab = (0 until 400).map(i => s"tok$i")
    def doc(n: Int) = (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = (0 until 150).map(i => (i.toLong, doc(60)))
    val copies = bases.take(40).map { case (i, t) => (1000L + i, t) }
    val longDoc = doc(400)
    val tweaked = (0 until 20).map { i =>
      val words = longDoc.split(" ").toVector
      (2000L + i, words.updated(i * 7 % words.size, s"swapped$i").mkString(" "))
    } :+ (2999L, longDoc)
    import spark.implicits._
    (bases ++ copies ++ tweaked).toDF("id", "text")
  }

  test("block keys == quarter keys == all-pairs at hamming ≤ 3") {
    val docs = corpus()
    def run(blocks: Boolean): Seq[(Long, Long, Int)] =
      Dedup.simhashPairs(docs, "id", "text", maxHamming = 3, blockKeys = Some(blocks))
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val fp = docs.select(col("id"), NativeHash.simhash64(col("text")).as("sim"))
    val brute = fp.as("a").join(fp.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val quarters = run(blocks = false)
    val blocks = run(blocks = true)
    info(s"${brute.size} pairs at hamming ≤ 3 (${brute.count(_._3 == 0)} exact)")
    assert(brute.nonEmpty, "corpus must exercise the cut")
    assert(brute.exists(_._3 > 0), "corpus should have nonzero-hamming near-dups")
    assert(quarters == brute)
    assert(blocks == brute)
  }

  test("identical docs collide in every table of both modes (degenerate corpus)") {
    import spark.implicits._
    val two = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")).toDF("id", "text")
    for (blocks <- Seq(false, true)) {
      val got = Dedup.simhashPairs(two, "id", "text", blockKeys = Some(blocks)).collect()
      assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq == Seq((1L, 2L, 0)))
    }
  }
}
