package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-grain dedup — the normalization pass a
  * web-corpus pipeline runs BEFORE content dedup, so the same page fetched
  * as `HTTP://WWW.Example.com:80/a/?utm_source=x&b=1#top` and
  * `http://example.com/a?b=1` collapses to one crawl record (the public
  * recipe: RFC 3986 §6 syntax-based normalization plus the de-facto
  * tracking-parameter strip every production crawler applies).
  *
  * Everything is built from codegen'd Column expressions (regexp_extract /
  * regexp_replace / split / filter / sort_array) — no UDFs, so the pass
  * rides whole-stage codegen over a 100 TB URL column, and every rule is
  * replayable in ANSI-ish SQL for the DuckDB gate.
  *
  * Rules (each oracle-replayed):
  *  - scheme and host lowercase; fragment dropped; `www.` prefix dropped
  *  - default ports dropped (`:80` for http, `:443` for https); other
  *    explicit ports kept
  *  - trailing slashes stripped from the path; empty path → `/`
  *  - tracking params dropped (`utm_*`, `fbclid`, `gclid`); the survivors
  *    sort lexicographically (param order is transport noise); empty query
  *    drops the `?`
  */
object Urls {

  // (?i): tracking params arrive in any case (UTM_SOURCE=, FBCLID=) while
  // only scheme/host are case-normalized — a case-sensitive strip would let
  // upper-cased variants of the same page survive as distinct crawl records
  // (r11 advice). The DuckDB oracle mirrors with regexp_matches(p, ..., 'i').
  private val trackingParam = "(?i)^(utm_[a-z]+|fbclid|gclid)="

  /** Canonical form of an absolute `scheme://host[:port][/path][?q][#f]`
    * URL (null-safe: null in → null out; codegen'd, no UDF).
    */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(afterScheme, "^([^/?]*)", 1)
    val host = regexp_replace(lower(regexp_replace(hostPort, ":[0-9]+$", "")), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portOut = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathQ = regexp_replace(afterScheme, "^[^/?]*", "")
    val pathStripped = regexp_replace(regexp_extract(pathQ, "^([^?]*)", 1), "/+$", "")
    val path = when(pathStripped === "", lit("/")).otherwise(pathStripped)
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = sort_array(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParam)))
    val queryOut = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portOut, path, queryOut)
  }
}
