package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the history-preserving upsert
  * at the heart of every warehouse ETL load (the reference's feed pipeline
  * overwrites rows in place; SCD2 is what replaces that overwrite when the
  * consumer needs to query "as of" an earlier load): given the current
  * dimension snapshot and a new feed snapshot, emit versioned rows with
  * validity intervals.
  *
  * Per key: unchanged → one open row (valid_from = tOld); changed → the
  * old version closed at tNew plus a new open row; deleted → the old
  * version closed at tNew; inserted → one open row at tNew.
  *
  * Scale shape: ONE full-outer join on the key (both sides shuffle once on
  * the same key — at 100 TB bucket the dimension table by this key and the
  * join co-locates), a null-safe attribute comparison, and a doc-local
  * explode of up to two literal-shaped rows per key. No window functions,
  * no second pass, no driver participation; attribute comparison is
  * null-safe (`<=>`) so NULL attribute values never fabricate a change.
  */
object Scd {

  def scd2(old: DataFrame, nw: DataFrame, keyCol: String, attrCols: Seq[String],
           tOld: Int = 0, tNew: Int = 1): DataFrame = {
    val o = old.select(col(keyCol).as("__k") +:
      (attrCols.map(c => col(c).as(s"__o_$c")) :+ lit(1).as("__in_o")): _*)
    val n = nw.select(col(keyCol).as("__k") +:
      (attrCols.map(c => col(c).as(s"__n_$c")) :+ lit(1).as("__in_n")): _*)
    val j = o.join(n, Seq("__k"), "full_outer")

    val inO = col("__in_o").isNotNull
    val inN = col("__in_n").isNotNull
    val same = inO && inN &&
      attrCols.map(c => col(s"__o_$c") <=> col(s"__n_$c")).reduce(_ && _)

    def row(src: String, vf: Int, vt: Option[Int], cur: Boolean) =
      struct(col("__k").as(keyCol) +: (attrCols.map(c => col(s"__${src}_$c").as(c)) ++ Seq(
        lit(vf).as("valid_from"),
        vt.map(v => lit(v)).getOrElse(lit(null)).cast("int").as("valid_to"),
        lit(cur).as("is_current"))): _*)

    j.select(explode(filter(array(
        when(inO && !same, row("o", tOld, Some(tNew), cur = false)),
        when(same, row("o", tOld, None, cur = true)),
        when(inN && !same, row("n", tNew, None, cur = true))
      ), x => x.isNotNull)).as("r"))
      .select("r.*")
  }
}
