package graft

import graft.operators.{Caches, TableLog}
import org.apache.spark.sql.functions._

/** Lakehouse commit-log ledger (`TableLog`): hand-computed accounting on a
  * planted action log, the compaction net-zero invariant, and time-travel
  * consistency against the underlying table.
  */
class TableLogSpec extends SparkSpec {
  import spark.implicits._

  private val handLog = Seq(
    // (commit, action, file, n_rows, bytes, min_key, max_key)
    (1L, "add", 10L, 5L, 100L, 1L, 9L),
    (1L, "add", 11L, 3L, 60L, 2L, 8L),
    (2L, "add", 20L, 4L, 80L, 10L, 14L),
    (3L, "remove", 10L, 5L, 100L, 1L, 9L),
    (3L, "remove", 11L, 3L, 60L, 2L, 8L),
    (3L, "add", 90L, 8L, 160L, 1L, 9L)
  ).toDF("commit_id", "action", "file_id", "n_rows", "bytes", "min_key", "max_key")

  test("snapshot accounting matches the hand model") {
    val got = TableLog.snapshotAccounting(handLog).orderBy("commit_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(7), r.getLong(8)))
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, 8L, 0L, 2L, 8L),   // commit, f_add, f_rm, r_add, r_rm, live_files, live_rows
      (2L, 1L, 0L, 4L, 0L, 3L, 12L),
      (3L, 1L, 2L, 8L, 8L, 2L, 12L))) // compaction: rows net zero
  }

  test("liveFilesAt resolves adds minus removes per snapshot") {
    def ids(s: Long) = TableLog.liveFilesAt(handLog, s)
      .select("file_id").as[Long].collect().sorted.toSeq
    assert(ids(1L) == Seq(10L, 11L))
    assert(ids(2L) == Seq(10L, 11L, 20L))
    assert(ids(3L) == Seq(20L, 90L))
  }

  test("vacuumPlan: removed files flip retained->deletable exactly at their remove commit; live never vacuums") {
    // handLog: files 10/11 removed at commit 3 (needed by snapshots <= 2),
    // files 20/90 live. horizon = oldest still-travelable commit.
    val got = TableLog.vacuumPlan(handLog, Seq(2L, 3L, 4L))
      .orderBy("horizon", "status").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      // horizon 2: snapshot 2 still travelable and contains 10/11 -> retained
      (2L, "deletable", 0L, 0L), (2L, "live", 2L, 240L), (2L, "retained", 2L, 160L),
      // horizon 3: every snapshot containing 10/11 expired -> deletable
      (3L, "deletable", 2L, 160L), (3L, "live", 2L, 240L), (3L, "retained", 0L, 0L),
      (4L, "deletable", 2L, 160L), (4L, "live", 2L, 240L), (4L, "retained", 0L, 0L)))
    // reconciliation: deletable+retained+live bytes are horizon-invariant
    val tot = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(tot.values.toSet.size == 1)
  }

  test("planted orders log: compaction nets to zero, snapshots reconcile with the table") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val log = TableLog.plantedLog(orders)
    val acct = TableLog.snapshotAccounting(log).orderBy("commit_id").collect()
    assert(acct.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val c4 = acct.last
    assert(c4.getAs[Long]("rows_added") == c4.getAs[Long]("rows_removed"))
    assert(c4.getAs[Long]("bytes_added") == c4.getAs[Long]("bytes_removed"))
    assert(c4.getAs[Long]("files_added") == 2L && c4.getAs[Long]("files_removed") == 8L)
    // final snapshot holds every order exactly once
    val nOrders = orders.count()
    assert(acct.last.getAs[Long]("live_rows") == nOrders)
    assert(TableLog.timeTravelScan(log, 4L).first().getAs[Long]("n_rows") == nOrders)
    // pre-compaction snapshot 2 = eras 1..2 = orders through 1998
    val n98 = orders.filter(year(col("o_orderdate")) <= 1998).count()
    assert(TableLog.timeTravelScan(log, 2L).first().getAs[Long]("n_rows") == n98)
    // compaction preserves the key span the manifest advertises
    val s4 = TableLog.timeTravelScan(log, 4L).first()
    val s3 = TableLog.timeTravelScan(log, 3L).first()
    assert(s4.getAs[Long]("min_key") == s3.getAs[Long]("min_key"))
    assert(s4.getAs[Long]("max_key") == s3.getAs[Long]("max_key"))
    Caches.release()
  }
}
