package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines (SURVEY.md §2.3),
  * all pure Catalyst expressions — per-row, shuffle-free, codegen-friendly.
  */
object TextFunctions {

  /** Lowercased whitespace tokens. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Whitespace-collapsed lowercase normalization (dedup canonical form). */
  def normText(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Distinct word set (1-gram shingles) — the jaccard/minhash unit. */
  def wordSet(c: Column): Column = array_distinct(tokens(c))

  /** Word n-gram shingles, space-joined. */
  def wordShingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => array_join(slice(t, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(t, " ")))
  }

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: letter runs, single digits, punctuation marks. */
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Count of stopword hits for a language's marker regex. */
  def stopwordHits(c: Column, markerRegex: String): Column =
    size(regexp_extract_all(lower(c), lit(markerRegex), lit(0)))

  /** Language-marker regexes (tiny stopword sets per language). */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in|is|it)\\b",
    "es" -> "\\b(el|la|de|que|y|los|las|un)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|nicht)\\b",
    "fr" -> "\\b(le|la|les|des|est|une|dans)\\b",
    "zh" -> "[\\x{4e00}-\\x{9fff}]" // \x{...} parses in both Java regex and RE2
  )

  /** Argmax-of-marker-hits language id; ties resolve in `langMarkers` order,
    * zero hits everywhere → "und".
    */
  def langId(c: Column): Column = {
    val hits = langMarkers.map { case (lang, re) => lang -> stopwordHits(c, re) }
    // strictly-greater chain ⇒ first language in list wins ties
    val best = hits.foldLeft((lit("und"), lit(0).cast("int"))) { case ((bl, bh), (lang, h)) =>
      (when(h > bh, lit(lang)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    best._1
  }

  /** Heuristic quality score in [0,1]: length band + stopword density −
    * punctuation excess. Pure per-row double arithmetic (deterministic and
    * mirrorable in ANSI SQL).
    */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val nTokens = tokenCountWs(c).cast("double")
    val punct = size(regexp_extract_all(c, lit("[.,!?;:]"), lit(0))).cast("double")
    val stop = stopwordHits(c, langMarkers.head._2).cast("double")
    val lenScore = least(nChars / lit(500.0), lit(1.0))
    val stopScore = least(stop / greatest(nTokens, lit(1.0)) * lit(4.0), lit(1.0))
    val punctPenalty = least(punct / greatest(nChars, lit(1.0)) * lit(10.0), lit(1.0))
    greatest(least(lenScore * lit(0.5) + stopScore * lit(0.5) - punctPenalty * lit(0.25), lit(1.0)), lit(0.0))
  }

  /** C4-style cleanup: redact URLs and emails, strip control chars,
    * collapse whitespace. Patterns kept to syntax with identical semantics
    * in Java regex and RE2 so the oracle can mirror them.
    */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  def cleanText(c: Column): Column = {
    val noUrl = regexp_replace(c, UrlPattern, "<URL>")
    val noMail = regexp_replace(noUrl, EmailPattern, "<EMAIL>")
    val noCtl = regexp_replace(noMail, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
    trim(regexp_replace(noCtl, "\\s+", " "))
  }

  /** PII-ish signal counts (redaction audit). */
  def urlCount(c: Column): Column = size(regexp_extract_all(c, lit(UrlPattern), lit(0)))
  def emailCount(c: Column): Column = size(regexp_extract_all(c, lit(EmailPattern), lit(0)))

  /** PII patterns beyond email: dotted-quad IPs, SSN-shaped ids, phone-ish
    * digit runs. Syntax restricted to constructs with identical semantics in
    * Java regex and RE2 (ASCII \b / \s, character classes, greedy
    * leftmost-first quantifiers) so the oracle can replay redaction exactly.
    */
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val PhonePattern = "\\+?[0-9][0-9()\\s./-]{6,}[0-9]"

  /** Staged PII redaction: email → IPv4 → SSN → phone. Stage ORDER is part
    * of the spec — each stage removes substrings a later, looser pattern
    * would otherwise partially match (an SSN is also a phone-shaped digit
    * run; an IP inside a sentence would feed the phone pattern's dot/digit
    * class), and each count is measured on the text the stage actually saw.
    * Returns struct(redacted, n_email, n_ip, n_ssn, n_phone) — one pure
    * per-row expression tree, shuffle-free and codegen-friendly.
    */
  def piiRedact(c: Column): Column = {
    def count(s: Column, p: String): Column = size(regexp_extract_all(s, lit(p), lit(0)))
    val nEmail = count(c, EmailPattern)
    val s1 = regexp_replace(c, EmailPattern, "<EMAIL>")
    val nIp = count(s1, Ipv4Pattern)
    val s2 = regexp_replace(s1, Ipv4Pattern, "<IP>")
    val nSsn = count(s2, SsnPattern)
    val s3 = regexp_replace(s2, SsnPattern, "<SSN>")
    val nPhone = count(s3, PhonePattern)
    val s4 = regexp_replace(s3, PhonePattern, "<PHONE>")
    struct(s4.as("redacted"), nEmail.as("n_email"), nIp.as("n_ip"),
      nSsn.as("n_ssn"), nPhone.as("n_phone"))
  }

  /** MD5 fingerprint of the normalized text (exact-dedup key). */
  def contentFingerprint(c: Column): Column = md5(normText(c))

  /** Polynomial rolling hash of the token stream (order-sensitive content
    * signature, unlike the set-based minhash). Sequential fold — Spark-only
    * (no oracle mirror needed; spec-tested).
    */
  def rollingHash(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => acc * lit(1000003L) + xxhash64(t))

  /** k-minhash signature over the word set: element i = min over words of
    * xxhash64(i, word). Used for LSH candidate generation only (the verify
    * step recomputes exact jaccard), so the hash needs no cross-engine twin.
    */
  def minhashSignature(c: Column, k: Int): Column = {
    val words = wordSet(c)
    transform(sequence(lit(0), lit(k - 1)), i => array_min(transform(words, w => xxhash64(i, w))))
  }

  /** 64-bit SimHash over tokens: bit b set iff the sum over tokens of
    * ±1 (sign of bit b of `md5_number_lower(token)`) is positive. The md5
    * family is the cross-engine one (DuckDB-reproducible), so simhash
    * fingerprints sit under the exact oracle gate; bit b of the LE uint64
    * lives in digest byte 8 + b/8 = hex chars 17+2k..18+2k of the digest.
    */
  def simhash64(c: Column): Column = {
    // hash each token ONCE (md5 hex); per-bit folds then index into it
    val hashes = transform(tokens(c), t => md5(t))
    val bitSums = transform(sequence(lit(0), lit(63)), b => {
      val bytePos = lit(17) + (b.cast("int") / 8).cast("int") * 2
      val bitInByte = b.cast("int") % 8
      aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(call_function("shiftright",
            conv(h.substr(bytePos, lit(2)), 16, 10).cast("int"), bitInByte)
            .bitwiseAND(1) === 1, 1L).otherwise(-1L))
    })
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)), (s, b) =>
        when(s > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }
}
