package graft.rules

import graft.core.RuleSpec._

/**
 * P11 — one-click rule templates bound from header keywords, mirroring the
 * reference UI's `_apply_templates` (`/root/reference/ui/pages/validate.py:541-579`)
 * keyword lists and error messages exactly.
 *
 * Divergence note (documented intent, SURVEY P12 policy): the reference binds
 * the Age template as `{type: "Whole number", between 0..120}` but its engine
 * evaluates only the whole-number check and silently drops the range
 * (`validation_engine.py:30-32`); likewise the amount template's
 * "greater than 0" operator is dropped. We implement the stated intent —
 * the range/positivity checks actually run.
 */
object Templates {

  val EmailKw = Seq("email")
  val PhoneKw = Seq("phone", "mobile", "contact")
  val AmountKw = Seq("amount", "salary", "price", "cost", "revenue")
  val PinKw = Seq("pincode", "pin_code", "zip")
  val PanKw = Seq("pan")

  val PinRegex = "^\\d{6}$"
  val PanRegex = "^[A-Z]{5}\\d{4}[A-Z]{1}$"

  /** Bind template rules for the given column names (order: per column, in
    * the reference's template order). */
  def bind(columns: Seq[String]): Seq[BoundRule] = columns.flatMap { c =>
    val cl = c.toLowerCase
    val rules = scala.collection.mutable.ArrayBuffer[BoundRule]()
    if (EmailKw.exists(cl.contains))
      rules += BoundRule(Pattern(c, "", "Email"), Some("Invalid email format"))
    if (PhoneKw.exists(cl.contains))
      rules += BoundRule(Pattern(c, "", "Phone"), Some("Invalid phone format"))
    if (AmountKw.exists(cl.contains)) {
      // "Decimal number, greater than 0": decimal check + the stated positivity
      rules += BoundRule(DecimalNumber(c), Some("Must be positive"))
      rules += BoundRule(Formula(c, s"try_cast($c as double) > 0"), Some("Must be positive"))
    }
    if (PinKw.exists(cl.contains))
      rules += BoundRule(Pattern(c, PinRegex, "custom"), Some("Invalid PIN code (6 digits)"))
    if (PanKw.exists(cl.contains))
      rules += BoundRule(Pattern(c, PanRegex, "custom"), Some("Invalid PAN format (ABCDE1234F)"))
    if (cl == "age") {
      rules += BoundRule(WholeNumber(c), Some("Age must be 0-120"))
      rules += BoundRule(NumericRange(c, 0, 120), Some("Age must be 0-120"))
    }
    rules.toSeq
  }
}
