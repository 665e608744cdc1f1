package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-wise cost of the prefix-filter join vs the banded
  * minhash candidate generator on the same corpus —
  * `runMain graft.PpjoinProbe <sfDir> <cpus>`.
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val ws = graft.functions.TextFunctions.wordSet(col("text"))
    val keyed = docs.select(col("doc_id").as("id"),
      md5(array_join(sort_array(ws), " ")).as("set_key"))
    val groups = keyed.groupBy("set_key").agg(min(col("id")).as("gmin"))
      .join(docs.select(col("doc_id").as("gmin"), col("text")), "gmin")
      .select(col("set_key"), sort_array(ws).as("words")).persist()
    timed("canonicalize")(println(s"  distinct sets: ${groups.count()}"))
    val tokDf = groups.select(explode(col("words")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df")).persist()
    timed("df")(println(s"  vocab: ${tokDf.count()}"))
    val ordered = groups.select(col("set_key"), explode(col("words")).as("w"))
      .join(tokDf, "w").groupBy("set_key")
      .agg(sort_array(collect_list(struct(col("df"), col("w")))).as("ow"))
      .select(col("set_key"), transform(col("ow"), s => s.getField("w")).as("ow"))
    val pref = ordered.withColumn("sz", size(col("ow")))
      .withColumn("p", (col("sz") - expr("(sz * 4 + 4) DIV 5") + 1).cast("int"))
      .select(col("set_key"), col("sz"),
        posexplode(slice(col("ow"), lit(1), col("p"))).as(Seq("pos", "w"))).persist()
    timed("order+prefix")(println(s"  prefix rows: ${pref.count()}"))
    val cand = pref.as("a").join(pref.as("b"),
      col("a.w") === col("b.w") && col("a.set_key") < col("b.set_key") &&
        lit(5L) * least(col("a.sz"), col("b.sz")) >=
          lit(4L) * greatest(col("a.sz"), col("b.sz")) &&
        (lit(1L) + least(col("a.sz") - 1 - col("a.pos"), col("b.sz") - 1 - col("b.pos"))) *
          lit(9L) >= lit(4L) * (col("a.sz") + col("b.sz")))
      .select(col("a.set_key").as("id_a"), col("b.set_key").as("id_b"))
    timed("raw candidates")(println(s"  raw cand: ${cand.count()}"))
    val dist = cand.distinct().persist()
    timed("distinct candidates")(println(s"  distinct cand: ${dist.count()}"))
    val reps = groups.select(col("set_key").as("id"), array_join(col("words"), " ").as("text"))
    val mc = graft.operators.Dedup.minhashCandidates(reps, "id", "text", 20, 2)
    timed("banded candidates")(println(s"  banded cand: ${mc.count()}"))
    spark.stop()
  }
}
