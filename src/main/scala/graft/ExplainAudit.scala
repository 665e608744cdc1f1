package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump formatted physical plans for the audit in PLANS.md. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = new StringBuilder
    val spark = GraftSession.local(8)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        out.append(s"==== $name ====\n").append(plan).append("\n")
      } catch { case e: Throwable => out.append(s"==== $name FAILED: ${e.getMessage}\n") }
    }
    Files.writeString(Paths.get("/tmp/plans.txt"), out.toString)
    spark.stop()
  }
}
