package graft

import java.nio.file.{Files, Paths}

/** The HUGEINT/decimal128 gate lint (r11 verdict #3): the driver hashes both
  * result sets through ARROW, so a DuckDB column exporting as
  * decimal128(38,0) (any un-cast integer SUM) hash-mismatches Spark's int64
  * even when every value is equal. That class shipped red three times (r1,
  * r9-r11 `q_more_like_this`, r11 `q_effective_tokens`) because nothing
  * checked representations before the driver ran, a full round later.
  *
  * This spec closes the hole at commit time with ZERO execution on either
  * side: every registered query is ANALYZED (schema only) and every oracle
  * is `DESCRIBE`d in local DuckDB (type inference only — the whole registry
  * lints in seconds), then `tools/lint_oracle_types.py` asserts each
  * column's arrow representation CLASS matches (int vs decimal128 vs float
  * vs ...). Re-introducing r11's un-cast `sum(...)` oracle pattern fails
  * this suite, not CORRECTNESS_r{N}.
  */
class OracleTypeLintSpec extends SparkSpec {

  test("every oracle's DuckDB types align with the Spark schema (arrow-representation gate)") {
    // JSON string escape — same contract as Verify's oracle_sql.json writer
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    val sparkTypes = SparkEntry.oracleSql.keys.toSeq.sorted.map { name =>
      val fields = SparkEntry.queries(name)(spark, sfDir).schema.fields
      s"${q(name)}: ${fields.map(f => s"${q(f.name)}: ${q(f.dataType.sql)}")
          .mkString("{", ",", "}")}"
    }.mkString("{", ",", "}")
    val oracles = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    val spec = s"""{"sf": ${q(sfDir)}, "oracles": $oracles, "spark": $sparkTypes}"""

    val tmp = Files.createTempFile("oracle_type_lint", ".json")
    Files.writeString(tmp, spec)
    val proc = new ProcessBuilder("python3",
        Paths.get("tools/lint_oracle_types.py").toAbsolutePath.toString,
        tmp.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = proc.waitFor()
    Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle arrow-type lint failed:\n$out")
  }
}
