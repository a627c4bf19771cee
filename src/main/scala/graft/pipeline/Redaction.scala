package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Rules-driven PII/sensitive-pattern redaction for training corpora.
  *
  * A redaction pass rewrites every match of each rule's regex with its
  * placeholder and reports per-rule match counts, so a pipeline can both
  * sanitize text and quantify leakage (e.g. drop documents above a PII
  * density threshold, audit counts per source).
  *
  * Semantics (deterministic, engine-portable):
  *  - match counts are taken against the ORIGINAL text, per rule;
  *  - replacements apply sequentially in rule order (rule i+1 sees rule
  *    i's output), so overlapping rules behave like a pipeline of sed
  *    passes.
  *
  * Scale shape: pure Column expressions (`regexp_replace`/`regexp_count`
  * are codegen'd) — zero shuffles, runs at scan speed over 100 TB, and
  * column-prunes/pushes down like any projection. Keep patterns to the
  * portable regex subset (character classes, quantifiers, alternation —
  * no backreferences or lookaround) so Java and RE2 engines agree.
  */
object Redaction {

  /** A redaction rule: portable regex → placeholder, with a short name
    * used to label the count column (`n_<name>`). */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Common PII rule set (portable across Java/RE2 regex engines). */
  val CommonPii: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    Rule("phone", "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
      "[PHONE]"),
    Rule("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "[IP]"),
    Rule("number", "[0-9]+", "[NUM]"))

  /** Redacted text column: rules applied sequentially. */
  def redactText(text: Column, rules: Seq[Rule]): Column =
    rules.foldLeft(text)((t, r) => regexp_replace(t, r.pattern, r.replacement))

  /** Per-document redaction: returns `idCol`, `redacted`, and one
    * `n_<rule>` count per rule (counted on the original text). */
  def redact(df: DataFrame, idCol: String, textCol: String,
      rules: Seq[Rule]): DataFrame = {
    val counts = rules.map(r =>
      regexp_count(col(textCol), lit(r.pattern)).cast(LongType)
        .as(s"n_${r.name}"))
    df.select(
      Seq(col(idCol), redactText(col(textCol), rules).as("redacted")) ++
        counts: _*)
  }
}
