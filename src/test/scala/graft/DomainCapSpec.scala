package graft

import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curation.capPerGroup: deterministic per-group cap — survivors are exactly
  * the cap lowest-md5-priority ids, small groups pass through whole, the
  * result is partition-invariant, and the declarative window form rewrites
  * to the bounded graft_topk aggregate.
  */
class DomainCapSpec extends SparkSpec {

  /** 4 groups: g0 has 40 docs, g1 has 7 (< cap), g2 has 10 (== cap), g3
    * has 1 — the cap must cut only g0.
    */
  private def corpus(): DataFrame = {
    import spark.implicits._
    val rows =
      (0 until 40).map(i => (i.toLong, "g0")) ++
      (100 until 107).map(i => (i.toLong, "g1")) ++
      (200 until 210).map(i => (i.toLong, "g2")) ++
      Seq((300L, "g3"))
    rows.toDF("id", "grp").withColumn("payload", concat(lit("body-"), col("id")))
  }

  private def capped(df: DataFrame) = Curation.capPerGroup(df, "id", "grp", cap = 10)

  test("survivors are exactly the cap lowest-md5-priority ids per group") {
    val got = capped(corpus()).select("grp", "id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = Map(
      "g0" -> (0 until 40).map(_.toLong).sortBy(i => md5hex(i.toString)).take(10).toSet,
      "g1" -> (100 until 107).map(_.toLong).toSet,
      "g2" -> (200 until 210).map(_.toLong).toSet,
      "g3" -> Set(300L))
    assert(got == want)
  }

  test("all non-id columns survive untouched") {
    val r = capped(corpus()).filter(col("grp") === "g3").collect().head
    assert(r.getAs[String]("payload") == "body-300")
    assert(capped(corpus()).columns.toSeq == Seq("id", "grp", "payload"))
  }

  test("partition invariance") {
    val a = capped(corpus().repartition(11)).orderBy("id").collect().toSeq
    val b = capped(corpus().repartition(2)).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("the window form rewrites to the bounded graft_topk aggregate") {
    val plan = capped(corpus()).queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_topk"), s"TopK rewrite did not fire:\n$plan")
    spark.conf.set("spark.graft.topk.rewrite", "false")
    val viaWindow = try capped(corpus()).orderBy("id").collect().toSeq
                    finally spark.conf.unset("spark.graft.topk.rewrite")
    assert(viaWindow == capped(corpus()).orderBy("id").collect().toSeq)
  }
}
