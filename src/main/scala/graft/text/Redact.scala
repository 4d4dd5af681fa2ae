package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex redaction of email addresses,
  * phone numbers, and IPv4 addresses, plus per-document match counts (the
  * audit signal a pipeline logs before rewriting documents). The reference
  * pipeline carries raw CDC text straight into the lake
  * (`/root/reference/src/hudi/hudi-cdc-load.py` does no content scrubbing);
  * a corpus pipeline must, so this is a beyond-reference first-class op.
  *
  * Patterns stay inside the Java∩RE2 regex subset (no backrefs, no
  * lookaround) so the DuckDB oracles replay them verbatim. Everything here
  * is a pure projection — codegen'd, shuffle-free, safe at any corpus size.
  */
object Redact {

  /** `user@host.tld` — local part then a dotted host with an alpha TLD. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style `NNN-NNN-NNNN` / `NNN.NNN.NNNN`. */
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Dotted-quad IPv4 (syntactic — no 0-255 range check, as is usual for
    * scrub passes: over-redaction is the safe direction). */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def countEmails(text: Column): Column =
    regexp_count(text, lit(emailRe)).cast("long")
  def countPhones(text: Column): Column =
    regexp_count(text, lit(phoneRe)).cast("long")
  def countIpv4(text: Column): Column =
    regexp_count(text, lit(ipv4Re)).cast("long")

  /** Redact all three PII classes. Order matters and is fixed: emails first
    * (their host part contains dotted runs the IP pattern could claim),
    * then IPs (dotted digit quads), then phones — and every placeholder is
    * digit-free, so no pass can create a match for a later one. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
}
