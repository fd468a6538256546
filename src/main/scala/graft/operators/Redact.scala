package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for a training corpus — the standard pre-training
  * redaction pass (emails, phone numbers, long account/ID digit runs
  * replaced by class tokens, with per-document hit counts kept for
  * curation stats). The reference has no text operators at all, so this is
  * north-star [ext] scope like the rest of the text suite.
  *
  * Everything is row-local (`regexp_count` + `regexp_replace` inside
  * whole-stage codegen): one corpus scan, no shuffle, no state — the shape
  * that runs at 100 TB as a pure map stage.
  *
  * Pattern discipline: every class pattern keeps to the regex subset with
  * identical semantics in Java regex (Spark) and RE2 (DuckDB) — character
  * classes, bounded/unbounded counted repetition, literal separators; no
  * backreferences, no lookaround, no alternation whose greedy/longest
  * resolutions could differ. That is what makes the whole pass
  * DuckDB-oracle-checkable (`q_pii_redact`), and it is also the subset
  * that stays linear-time in RE2 on adversarial corpus bytes.
  *
  * Classes are applied IN ORDER, each counting on the text as already
  * redacted by earlier classes (so a phone inside an already-redacted
  * email is not double-counted); the per-class counts are therefore
  * well-defined regardless of pattern overlap.
  */
object Redact {

  /** Email addresses (conservative: local@domain.tld). */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style phone numbers with fixed separators (optional +CC). */
  val PhoneRe: String = "\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Long digit runs (9+): SSNs, account numbers, card PANs. */
  val LongDigitsRe: String = "[0-9]{9,}"

  /** (countColumn, pattern, replacement), applied in order. */
  val Classes: Seq[(String, String, String)] = Seq(
    ("n_emails", EmailRe, "<EMAIL>"),
    ("n_phones", PhoneRe, "<PHONE>"),
    ("n_ids", LongDigitsRe, "<ID>"))

  /** `df` plus one `n_<class>` LONG count per redaction class and
    * `outCol` = the fully redacted text. One codegen'd map stage. */
  def scrub(df: DataFrame, textCol: String, outCol: String = "redacted",
            classes: Seq[(String, String, String)] = Classes): DataFrame = {
    val start: (DataFrame, Column) = (df, col(textCol))
    val (out, red) = classes.foldLeft(start) { case ((d, t), (cnt, re, repl)) =>
      (d.withColumn(cnt, regexp_count(t, lit(re)).cast("long")),
        regexp_replace(t, re, repl))
    }
    out.withColumn(outCol, red)
  }
}
