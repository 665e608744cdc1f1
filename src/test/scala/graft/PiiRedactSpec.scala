package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

/** Staged PII redaction: per-type placeholders + counts, and the stage
  * ORDER contract (email → IP → SSN → phone) that keeps looser patterns
  * from double-counting substrings an earlier stage already owned.
  */
class PiiRedactSpec extends SparkSpec {
  import spark.implicits._

  private def redact(text: String): (String, Int, Int, Int, Int) = {
    val r = Seq(text).toDF("t").select(TF.piiRedact(col("t")).as("p"))
      .select("p.redacted", "p.n_email", "p.n_ip", "p.n_ssn", "p.n_phone")
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  test("each type redacts to its placeholder with its count") {
    val (out, e, ip, ssn, ph) = redact(
      "mail bob.smith+x@corp.example.org host 10.0.3.200 id 123-45-6789 call +1 (555) 010-4242 end")
    assert(out == "mail <EMAIL> host <IP> id <SSN> call <PHONE> end")
    assert((e, ip, ssn, ph) == (1, 1, 1, 1))
  }

  test("stage order: SSN and IP are not re-counted by the looser phone pattern") {
    // an SSN IS phone-shaped (digits and dashes) — it must be consumed by
    // the SSN stage, leaving n_phone for the true phone only
    val (_, e, ip, ssn, ph) = redact("a 987-65-4321 b 0800 123 456 c")
    assert((e, ip, ssn, ph) == (0, 0, 1, 1))
  }

  test("multiple hits of one type all redact") {
    val (out, e, _, _, _) = redact("x a@b.co y c@d.org z")
    assert(out == "x <EMAIL> y <EMAIL> z" && e == 2)
  }

  test("text without PII passes through unchanged, all counts zero") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(redact(s) == ((s, 0, 0, 0, 0)))
  }

  test("short digit runs are not phones; dotted decimals are not IPs") {
    val (out, _, ip, _, ph) = redact("version 1.2.3 of 12345 items")
    // 1.2.3 has three octets, not four; 12345 is too short for the phone run
    assert(out == "version 1.2.3 of 12345 items" && ip == 0 && ph == 0)
  }
}
