package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** PII detection and redaction for training-data pipelines.
  *
  * Web-scale corpora are scrubbed of personally-identifying strings before
  * training (emails, phone numbers, IP addresses are the standard regex
  * tier — see e.g. the C4 / BigScience data-governance pipelines). This is
  * pure `regexp_count`/`regexp_replace` column algebra: row-local,
  * codegen'd, zero shuffle — on a 1000-executor cluster it runs at
  * parquet-scan speed, which is exactly what a 100 TB scrub needs.
  *
  * The patterns are deliberately ASCII-only and RE2-compatible (no
  * backreferences, no lookarounds) so the same pattern strings behave
  * identically under Java regex (Spark) and RE2 (the DuckDB oracle and
  * most production scrubbers, which run RE2 for linear-time safety on
  * adversarial inputs).
  */
object Pii {

  /** Lowercase ASCII email. */
  val EmailRe: String = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""

  /** NANP-style phone: 555-123-4567. */
  val PhoneRe: String = """\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"""

  /** Dotted-quad IPv4 (no octet-range check — scrubbers over-redact). */
  val Ipv4Re: String = """\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"""

  val EmailTag = "<EMAIL>"
  val PhoneTag = "<PHONE>"
  val Ipv4Tag = "<IP>"

  /** Detect + redact in one pass. Counts are taken on the progressively
    * redacted text (emails first, then phones, then IPv4) so a dotted quad
    * inside an email body is never double-counted — the oracle replays the
    * same order.
    *
    * @return idCol, n_emails, n_phones, n_ipv4, redacted
    */
  def detectRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, EmailTag)
    val t2 = regexp_replace(t1, PhoneRe, PhoneTag)
    val t3 = regexp_replace(t2, Ipv4Re, Ipv4Tag)
    df.select(
      col(idCol),
      regexp_count(t0, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t1, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(t2, lit(Ipv4Re)).cast("long").as("n_ipv4"),
      t3.as("redacted"))
  }

  /** Filter flavor: drop rows whose text contains any detectable PII —
    * the "quarantine, don't patch" policy some pipelines prefer.
    */
  def dropPii(df: DataFrame, textCol: String): DataFrame =
    df.filter(regexp_count(col(textCol), lit(EmailRe)) === 0 &&
      regexp_count(col(textCol), lit(PhoneRe)) === 0 &&
      regexp_count(col(textCol), lit(Ipv4Re)) === 0)

  /** `http(s)://host` occurrences; group 1 captures the host. */
  val UrlRe: String = """https?://([a-z0-9.-]+)(?:/[^\s]*)?"""

  /** Per-document URL/domain signals — the provenance-filtering step of
    * every web-corpus pipeline (C4's blocklist, RefinedWeb's URL
    * curation): registered domains are extracted from in-text URLs and
    * scored against a blocklist. The "registered domain" here is the
    * last two host labels — the public-suffix-list refinement is a data
    * swap, not a code change.
    *
    * Row-local regexp column algebra end to end (the blocklist becomes
    * a literal array — curated lists are 10³–10⁵ entries, a constant in
    * codegen terms): zero shuffle, scan-speed at 100 TB.
    *
    * @return idCol, n_urls, n_blocked, domains (distinct, sorted,
    *         comma-joined), blocked (any blocklisted domain present)
    */
  def urlSignals(df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    val hosts = regexp_extract_all(lower(col(textCol)), lit(UrlRe), lit(1))
    // registered domain = last two dot-labels of the host
    val domains = transform(hosts, h => {
      val parts = split(h, "\\.")
      concat_ws(".", slice(parts, greatest(size(parts) - 1, lit(1)), lit(2)))
    })
    val bl = array(blocklist.map(lit): _*)
    df.select(
      col(idCol),
      size(hosts).cast("long").as("n_urls"),
      size(filter(domains, d => array_contains(bl, d))).cast("long").as("n_blocked"),
      concat_ws(",", array_sort(array_distinct(domains))).as("domains"),
      (size(filter(domains, d => array_contains(bl, d))) > 0).as("blocked"))
  }
}
