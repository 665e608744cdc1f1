package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session, cheap). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  /** Set session confs for the duration of `body`, restoring the previous
    * values after — the session is shared across suites, so every conf
    * change must be scoped.
    */
  def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

object SparkSpec {
  // tests exercise semantics on KB-scale data: wide initial shuffles (the
  // SPARK_GRAFT_INIT_PARTS scale knob, measured +60% suite wall-clock at
  // 256) only add per-shuffle scheduling overhead here, so specs pin the
  // knob to the thread count regardless of the environment. Scale behavior
  // is measured by the bench, not the unit suite.
  lazy val session: SparkSession = {
    val s = GraftSession.tune(SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4"))
      // AFTER tune: builder options are last-write-wins, and tune() sets the
      // production-posture 256
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
