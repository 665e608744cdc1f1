package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-grain dedup with document reassembly — the C4/CCNet boilerplate
  * pass: a line that recurs across a crawl (navbars, cookie banners,
  * footers, share buttons) survives only at its globally FIRST occurrence;
  * every other copy is dropped and the documents are stitched back
  * together from their surviving lines. This is the op that removes the
  * single largest bulk of near-duplicate text from a web corpus before
  * any fuzzy dedup runs.
  *
  * Contract: lines split on '\n'; a line participates in dedup iff its
  * TRIMMED length ≥ `minLen` (short lines — list bullets, "Yes." —
  * duplicate naturally and are always kept); the winner of a duplicate
  * group is the lowest (id, line_idx); reassembled text joins kept lines
  * in original order. Deterministic and partitioning-independent: the
  * winner is a total-order min, no floats anywhere.
  *
  * Scale shape: one map-side-combined min-struct aggregation keyed by the
  * trimmed line (the classic C4 job — at 100 TB key the shuffle by a
  * 128-bit line hash and keep the text out of the exchange; the string
  * key here keeps the registered artifact oracle-exact), one join back on
  * the same key, one per-doc regroup for reassembly. No corpus² anywhere:
  * cost is |lines| log-ish, dominated by the two shuffles.
  */
object LineDedup {

  /** (id, text, n_kept, n_dropped) — `text` reassembled from surviving
    * lines in original order ('' when nothing survives).
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val lines = docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("line_idx", "line")))
      .withColumn("tl", trim(col("line")))
    val winners = lines.filter(length(col("tl")) >= minLen)
      .groupBy("tl")
      .agg(min(struct(col("id"), col("line_idx"))).as("w"))
      .select(col("tl"), col("w.id").as("wid"), col("w.line_idx").as("widx"))
    lines.join(winners, Seq("tl"), "left")
      .withColumn("keep",
        col("wid").isNull || (col("wid") === col("id") && col("widx") === col("line_idx")))
      .groupBy("id")
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("keep"), struct(col("line_idx"), col("line"))))),
          s => s.getField("line")), "\n").as("text"),
        sum(when(col("keep"), 1).otherwise(0)).cast("int").as("n_kept"),
        sum(when(col("keep"), 0).otherwise(1)).cast("int").as("n_dropped"))
      .withColumnRenamed("id", idCol)
  }
}
