package graft

/** Driver-contract insurance: entry() has rows, every registered query runs
  * at sf0.001, and every oracleSql key has a matching query.
  */
class RegistrySpec extends SparkSpec {

  test("entry() produces rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a query; oracle SQL is non-empty") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
