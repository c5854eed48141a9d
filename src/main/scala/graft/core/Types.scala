package graft.core

/**
 * Core data model of the graft validation engine.
 *
 * The engine's primary table shape (BASELINE.json `input_hint`):
 * {{{
 *   docs(doc_id: string,
 *        spans : array<struct<kind:string, text:string, media_ref:string, offset:int>>,
 *        part  : int)
 * }}}
 *
 * Semantics derive from the reference engine's data model
 * (`/root/reference/src/engine/validation_engine.py:8-98`,
 * `/root/reference/src/semantic_pipeline/types.py:5-42`); the representation is
 * Spark-native: case classes with implicit Encoders, all rule evaluation
 * compiled to Catalyst Column expressions.
 */

/** One span of an interleaved text+media document. `text` is null for media
  * spans, `media_ref` null for text spans; `offset` is 0-based and strictly
  * increasing within a document. */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One interleaved document; `part` is the table's partition column. */
case class Doc(doc_id: String, spans: Seq[Span], part: Int)

/** Asset-catalog row — referential-integrity side for `media_ref` (SURVEY J4). */
case class Asset(asset_id: String, media_kind: String)

/** Severity ladder, mirroring the reference's semantic pipeline
  * (`/root/reference/src/semantic_pipeline/types.py:26-35`). */
object Severity {
  val Error = "ERROR"
  val Warning = "WARNING"
  val Info = "INFO"
  /** Score penalty weights (`/root/reference/src/semantic_pipeline/scorer.py:16-20`). */
  val weight: Map[String, Double] =
    Map(Error -> 5.0, Warning -> 2.0, Info -> 0.5)
}

/** Declarative validation rules — the ADT compiled by [[graft.rules.Rules]] to
  * failure-mask Columns. Mirrors the reference's rule strings
  * (`/root/reference/src/engine/validation_engine.py:21-67`) plus the three
  * UI-only rules the reference engine silently drops
  * (`/root/reference/ui/pages/validate.py:313-353` — SURVEY P12) and the
  * north-rule additions (span rules, referential integrity). */
sealed trait RuleSpec {
  def column: String
  /** Stable rule identifier used in violation rows and reasons. */
  def ruleId: String
}
object RuleSpec {
  /** P1 — fail if not numeric or has a fractional part. */
  case class WholeNumber(column: String) extends RuleSpec { val ruleId = s"whole_number($column)" }
  /** P2 — fail if non-null value is not numeric. */
  case class DecimalNumber(column: String) extends RuleSpec { val ruleId = s"decimal_number($column)" }
  /** P3 — fail if null or blank after trim. */
  case class Required(column: String) extends RuleSpec { val ruleId = s"required($column)" }
  /** P4 — fail ALL rows sharing a duplicated value (pandas `duplicated(keep=False)`). */
  case class Unique(column: String) extends RuleSpec { val ruleId = s"unique($column)" }
  /** P5 — fail unless the string matches `regex` (null fails, pandas `na=False`). */
  case class Pattern(column: String, regex: String, name: String = "custom") extends RuleSpec { val ruleId = s"pattern_$name($column)" }
  /** P6 — fail if value not present anywhere in `otherColumn` (same table). */
  case class InColumn(column: String, otherColumn: String) extends RuleSpec { val ruleId = s"in_column($column->$otherColumn)" }
  /** P7 — fail rows where the SQL boolean `expr` is NOT satisfied. */
  case class Formula(column: String, sql: String) extends RuleSpec { val ruleId = s"formula($column)" }
  /** P12a — fail if string length outside [lo, hi]. */
  case class TextLength(column: String, lo: Int, hi: Int) extends RuleSpec { val ruleId = s"text_length($column)" }
  /** P12b — fail if date outside [lo, hi] (ISO yyyy-MM-dd bounds). */
  case class DateRange(column: String, lo: String, hi: String) extends RuleSpec { val ruleId = s"date_range($column)" }
  /** P12c — fail if value not in the allowed list (P15 enum mask). */
  case class AllowedValues(column: String, allowed: Seq[String]) extends RuleSpec { val ruleId = s"allowed_values($column)" }
  /** P14 — fail if numeric value outside [lo, hi]. */
  case class NumericRange(column: String, lo: Double, hi: Double) extends RuleSpec { val ruleId = s"numeric_range($column)" }
  /** P16 — fail if date strictly after the pinned run timestamp. */
  case class NoFutureDate(column: String, runTs: java.sql.Timestamp) extends RuleSpec { val ruleId = s"no_future_date($column)" }

  // ---- north-rule span-level rules (docs table) ----
  /** Span offsets strictly increasing within each document. */
  case class SpanOffsetsMonotonic(column: String = "spans") extends RuleSpec { val ruleId = "span_offsets_monotonic" }
  /** Text spans must carry text and no media_ref; media spans the reverse. */
  case class SpanFieldConsistency(column: String = "spans") extends RuleSpec { val ruleId = "span_field_consistency" }
  /** Document must have at least one span. */
  case class SpansNonEmpty(column: String = "spans") extends RuleSpec { val ruleId = "spans_non_empty" }
}

// NOTE: the actual reference pattern regexes live in graft.rules.Rules.Regexes
// (a previous dead `Patterns` object here carried DIFFERENT regexes with a
// doc claiming reference fidelity — deleted to prevent misuse).

/** A violation row: which rule failed, on which document, and the offending
  * span if the rule is span-level (BASELINE `north_star` artifact shape). */
case class Violation(rule_id: String, doc_id: String, part: Int,
                     span_offset: Integer, detail: String)

/** Per-partition verdict row (north rule: per-partition pass/fail). */
case class PartitionVerdict(part: Int, total_rows: Long, passed: Long,
                            failed: Long, status: String, rules_evaluated: Int)

/** Per-column failure summary, reference shape
  * (`/root/reference/src/engine/validation_engine.py:79-86`). */
case class ColumnSummary(column: String, rule_id: String, failed_count: Long)

/** Semantic-pipeline issue (`/root/reference/src/semantic_pipeline/types.py:26-35`). */
case class ValidationIssue(column: String, detected_type: String, severity: String,
                           rule_id: String, message: String, rows_affected: Long,
                           examples: Seq[String], suggested_fix: String)

/** Cleaning change-log entry (`/root/reference/src/semantic_pipeline/types.py:37-42`). */
case class ChangeLog(column: String, operation: String, rows_changed: Long,
                     examples: Seq[String])

/** Audit-trail entry (`/root/reference/src/engine/audit/audit_logger.py`). */
case class AuditEntry(run_id: String, stage: String, status: String,
                      rows_in: Long, rows_out: Long, detail: String)

/** Checkpoint-ledger row: one per processed partition; presence ⇒ the
  * partition is complete and is skipped on resume (SURVEY §7 resumability) —
  * but only when `rules_hash` matches the resuming config's rule set, so a
  * rule edit between attempts forces re-validation instead of silently
  * mixing verdicts from two suites. A re-validated partition appends a
  * SECOND row for the same (run_id, part); `attempt_ts` orders attempts so
  * readers reduce to the latest row (stale rows never double-weight ledger
  * sketches or resurrect trust in overwritten artifacts). The parquet row
  * additionally carries the always-present `sketches` / `hll_sketches` map
  * columns (null when unconfigured). */
case class LedgerEntry(run_id: String, part: Int, status: String,
                       total_rows: Long, failed_rows: Long, violations: Long,
                       wall_ms: Long, rules_hash: String, attempt_ts: Long)
