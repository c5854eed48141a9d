package graft.semantic

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Severity, ValidationIssue, ChangeLog}
import graft.clean.Cleaners

/** Semantic column types (`/root/reference/src/semantic_pipeline/types.py:5-17`). */
object ColumnType extends Enumeration {
  val PERSON_NAME, PHONE_NUMBER, EMAIL, DATE_OF_BIRTH, AGE, LOCATION, GENDER,
      NUMERIC, CATEGORICAL, DATETIME, BOOLEAN, UNKNOWN = Value
}

case class TypeMetadata(detectedType: ColumnType.Value, confidence: Double,
                        reasons: Seq[String])

/**
 * Semantic type detector — Spark re-expression of `ColumnTypeDetector`
 * (`/root/reference/src/semantic_pipeline/detector.py:11-99`): header keyword
 * regexes + value-regex match rates on a sample + boolean-token ratio +
 * numeric-coercion success + cardinality, combined by weighted scoring with a
 * 1.5× semantic boost. All value statistics come from ONE agg over a sampled
 * projection — no per-value driver loops.
 */
object Detector {
  import ColumnType._

  val HeaderKeywords: Seq[(ColumnType.Value, Seq[String])] = Seq(
    PERSON_NAME -> Seq("name", "fullname", "person", "customer", "client"),
    PHONE_NUMBER -> Seq("phone", "mobile", "contact", "tel", "cell"),
    EMAIL -> Seq("email", "mail", "e-mail"),
    DATE_OF_BIRTH -> Seq("dob", "birth", "born", "bday"),
    AGE -> Seq("age", "years", "yr", "old"),
    LOCATION -> Seq("city", "state", "country", "address", "location", "place"),
    GENDER -> Seq("gender", "sex", "m/f"))

  val RegexPatterns: Seq[(ColumnType.Value, String)] = Seq(
    EMAIL -> "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$",
    PHONE_NUMBER -> "^(\\+?\\d{1,3}[-.\\s]?)?(\\(?\\d{3}\\)?[-.\\s]?)?\\d{3}[-.\\s]?\\d{4}$",
    DATE_OF_BIRTH -> "^\\d{4}-\\d{2}-\\d{2}$|^\\d{2}/\\d{2}/\\d{4}$|^\\d{2}-\\d{2}-\\d{4}$")

  val BoolTokens = Seq("true", "false", "yes", "no", "y", "n", "0", "1")
  private val Semantic = Set(EMAIL, PHONE_NUMBER, DATE_OF_BIRTH, AGE,
    PERSON_NAME, GENDER, LOCATION)

  /** Detect all columns in TWO Spark jobs: (1) one full-table agg computing
    * row count + per-column `approx_count_distinct` — the cardinality ratio
    * matches the reference's `series.nunique()/len(series)` over the FULL
    * column (`detector.py:69`; ADVICE r3: an r3 interim sampled this ratio,
    * silently unclassifying moderate-cardinality CATEGORICAL columns); (2)
    * one agg over a seeded Bernoulli sample computing every regex/bool/
    * numeric rate — only those checks are sampled, exactly like the
    * reference's 100-row sample (`detector.py:30,47`). Decisions are
    * driver-side folds (detector.py:83-99).
    *
    * The sample is a real `sample(fraction, seed)` spanning EVERY partition
    * (fraction sized from the job-1 count to yield ~2× `sampleRows` rows in
    * expectation — bounded at any table size, so no limit operator and no
    * extra limit jobs) — not the head-of-table `limit` chain r3 used, which
    * on a sorted/time-partitioned table fed the detector one stratum
    * (VERDICT r3 item 6). Tables with ≤ 2×`sampleRows` rows are read whole,
    * so small-fixture detection (and the q28/q29/q33 oracles) is unchanged. */
  def detectTypes(df: DataFrame, sampleRows: Int = 100, seed: Long = 42L): Map[String, TypeMetadata] = {
    val cols = df.columns.toSeq
    if (cols.isEmpty) return Map.empty
    // Job 1: full-table cardinalities + counts (total AND per-column
    // non-null — the reference runs ALL value analysis, including the
    // cardinality check, only under `if len(non_null) > 0`, detector.py:45),
    // one wide agg.
    val cardAggs: Seq[Column] = count(lit(1)).as("__rows") +:
      (cols.map(c => approx_count_distinct(col(c)).as(s"$c::card")) ++
       cols.map(c => count(col(c)).as(s"$c::nn")))
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val s = trim(col(c).cast("string"))
      RegexPatterns.map { case (t, re) =>
        avg(when(col(c).isNotNull, s.rlike(re).cast("double")))
          .as(s"$c::re_$t") } ++ Seq(
        avg(when(col(c).isNotNull, lower(s).isin(BoolTokens: _*).cast("double")))
          .as(s"$c::bool"),
        avg(when(col(c).isNotNull,
          Cleaners.coerceNumeric(col(c)).isNotNull.cast("double"))).as(s"$c::num"))
    }
    // Size-gated speculative job 2 (guide §2.6): job 2's only dependency on
    // job 1 is the sample FRACTION, and a table under a few MB always
    // yields fraction 1.0 — where `sample(1.0)` keeps every row, so the
    // whole-table rate agg IS the sampled agg. Launch it concurrently with
    // job 1 when the plan's size estimate is tiny; if job 1 then reports
    // more rows than 2×sampleRows (possible on very compact wide tables),
    // fall back to the proper sampled job — the discarded speculative agg
    // cost at most a one-split scan. Rates are bit-identical either way.
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val fFull =
      if (estBytes < (16L << 20))
        Some(scala.concurrent.Future(
          df.agg(aggs.head, aggs.tail: _*).collect()(0))(
          scala.concurrent.ExecutionContext.global))
      else None
    val cardRow = df.agg(cardAggs.head, cardAggs.tail: _*).collect()(0)
    val fullRows = cardRow.getAs[Long]("__rows")
    // Job 2: seeded cross-partition sample, every per-column rate in one agg.
    val fraction = math.min(1.0,
      if (fullRows == 0) 1.0 else 2.0 * sampleRows / fullRows)
    val statRow = fFull match {
      case Some(f) if fraction >= 1.0 =>
        scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)
      case _ =>
        val sample = df.sample(withReplacement = false, fraction, seed)
        sample.agg(aggs.head, aggs.tail: _*).collect()(0)
    }
    val rows = fullRows

    def rate(k: String): Double = {
      val i = statRow.fieldIndex(k)
      if (statRow.isNullAt(i)) 0.0 else statRow.getDouble(i)
    }
    cols.map { c =>
      val name = c.toLowerCase.trim
      var matches = Seq.empty[(ColumnType.Value, Double, String)]
      HeaderKeywords.foreach { case (t, pats) =>
        pats.find(p => name.contains(p) || p.r.findFirstIn(name).isDefined)
          .foreach(p => matches :+= ((t, 0.4, s"Header match: $p")))
      }
      RegexPatterns.foreach { case (t, _) =>
        val r = rate(s"$c::re_$t")
        if (r > 0.5) matches :+= ((t, r * 0.6, f"Regex match ratio: $r%.2f"))
      }
      val boolR = rate(s"$c::bool")
      if (boolR > 0.8) matches :+= ((BOOLEAN, boolR, "Boolean token analysis"))
      // pandas pd.to_numeric(sample) succeeds only if EVERY value coerces
      if (rate(s"$c::num") >= 1.0) matches :+= ((NUMERIC, 0.5, "Numeric conversion success"))
      val uniqueRatio = if (rows == 0) 1.0
        else cardRow.getAs[Long](s"$c::card").toDouble / rows
      // an all-null column has uniqueRatio 0 but must stay UNKNOWN, not
      // CATEGORICAL: the reference skips value analysis entirely when the
      // non-null set is empty (detector.py:45,69 — ADVICE r4)
      val nonNull = cardRow.getAs[Long](s"$c::nn")
      if (uniqueRatio < 0.2 && rows > 20 && nonNull > 0)
        matches :+= ((CATEGORICAL, 0.6, "Low cardinality"))

      if (matches.isEmpty) c -> TypeMetadata(UNKNOWN, 0.0, Seq("No patterns matched"))
      else {
        val scored = matches.groupBy(_._1).view.mapValues { ms =>
          (ms.map(m => if (Semantic.contains(m._1)) m._2 * 1.5 else m._2).sum,
           ms.map(_._3))
        }.toMap
        val (best, (score, reasons)) = scored.maxBy { case (t, (s, _)) => (s, -t.id) }
        c -> TypeMetadata(best, math.min(1.0, score), reasons.toSeq)
      }
    }.toMap
  }
}

/**
 * Semantic validators V1–V9 (`/root/reference/src/semantic_pipeline/validator.py`)
 * — flag-only, never mutate. All issue counts for the whole table come from
 * ONE wide agg; examples come from one small follow-up collect per flagged
 * rule (bounded to 3 rows, reference `:47,60,72`).
 */
object SemanticValidators {
  import ColumnType._

  val EmailRe = "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"

  /** Failure-mask column per (column, semantic type); None when the type has
    * no row-level rule. `runTs` pins `Timestamp.now()` (SURVEY §7.4). */
  def mask(c: String, t: ColumnType.Value, runTs: java.sql.Timestamp): Option[(String, String, Column)] = {
    val s = col(c).cast("string")
    t match {
      case PERSON_NAME => Some(("NAME_format", Severity.Warning,
        col(c).isNotNull && size(split(trim(s), "\\s+")) < 2))
      case PHONE_NUMBER => Some(("PHONE_format", Severity.Error,
        col(c).isNotNull && !regexp_replace(s, "\\D", "").rlike("^\\d{10}$")))
      case EMAIL => Some(("EMAIL_format", Severity.Error,
        col(c).isNotNull && !lower(s).rlike(EmailRe)))
      case DATE_OF_BIRTH => Some(("DOB_range", Severity.Error,
        Cleaners.parseDateMulti(col(c)) > lit(runTs)))
      case AGE => Some(("AGE_range", Severity.Error,
        Cleaners.coerceNumeric(col(c)) < 0 || Cleaners.coerceNumeric(col(c)) > 120))
      case GENDER => Some(("GENDER_standard", Severity.Warning,
        col(c).isNotNull && !lower(s).isin("male", "female", "other", "m", "f", "o", "unknown")))
      case _ => None
    }
  }

  /** Full validation pass: per-type rules + LOCATION casing + cross-column
    * DOB↔AGE and NAME↔EMAIL — counts AND per-issue examples in ONE agg job.
    * Round 2 launched a `filter(mask).limit(3).collect()` job per flagged
    * issue after the agg (a fresh table scan each at scale); examples are now
    * folded into the same agg via the bounded [[graft.functions.Collect]]
    * aggregator (3 smallest distinct masked values — deterministic, state
    * capped at 3 regardless of table size). */
  def validate(df: DataFrame, typeMap: Map[String, TypeMetadata],
               runTs: java.sql.Timestamp): Seq[ValidationIssue] = {
    val masks: Seq[(String, String, String, String, String, Column)] =
      typeMap.toSeq.sortBy(_._1).flatMap { case (c, meta) =>
        mask(c, meta.detectedType, runTs).map { case (rid, sev, m) =>
          (c, meta.detectedType.toString, sev, rid, messageFor(rid), m) }
      }
    // LOCATION casing (V6) is distribution-level: istitle ratio in (0.1, 0.9)
    val locCols = typeMap.collect { case (c, m) if m.detectedType == LOCATION => c }.toSeq.sorted
    val crossDob = crossDobAgeMask(df, typeMap, runTs)
    val crossNameEmail = crossNameEmailMask(df, typeMap)

    if (masks.isEmpty && locCols.isEmpty && crossDob.isEmpty && crossNameEmail.isEmpty)
      return Nil
    val ex = graft.functions.Collect.cappedMin(3)
    def exVal(m: Column, c: String): Column = // masked value, null-as-"null"
      when(m, coalesce(col(c).cast("string"), lit("null")))
    def locBadMask(c: String): Column = col(c).isNotNull &&
      trim(col(c).cast("string")) =!= initcap(trim(col(c).cast("string")))
    val aggExprs: Seq[Column] =
      masks.zipWithIndex.map { case (m, i) => sum(m._6.cast("long")).as(s"m_$i") } ++
      masks.zipWithIndex.map { case (m, i) => ex(exVal(m._6, m._1)).as(s"ex_$i") } ++
      locCols.map(c => avg((col(c).isNotNull &&
        trim(col(c).cast("string")) === initcap(trim(col(c).cast("string")))).cast("double")
        ).as(s"loc_$c")) ++
      locCols.map(c => sum(col(c).isNotNull.cast("long")).as(s"locn_$c")) ++
      locCols.map(c => ex(exVal(locBadMask(c), c)).as(s"locex_$c")) ++
      crossDob.map { case (_, m) => sum(m.cast("long")).as("cross_dob") }.toSeq ++
      crossNameEmail.map { case (_, m) => sum(m.cast("long")).as("cross_ne") }.toSeq
    val row = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    def exAt(k: String): Seq[String] = {
      val i = row.fieldIndex(k)
      if (row.isNullAt(i)) Nil else row.getSeq[String](i).toSeq
    }

    val typed = masks.zipWithIndex.flatMap { case ((c, dt, sev, rid, msg, _), i) =>
      val n = if (row.isNullAt(row.fieldIndex(s"m_$i"))) 0L else row.getAs[Long](s"m_$i")
      if (n > 0) Some(ValidationIssue(c, dt, sev, rid, msg, n, exAt(s"ex_$i"), fixFor(rid)))
      else None
    }
    val loc = locCols.flatMap { c =>
      val i = row.fieldIndex(s"loc_$c")
      if (row.isNullAt(i)) None else {
        val ratio = row.getDouble(i)
        val nn = row.getAs[Long](s"locn_$c")
        if (ratio > 0.1 && ratio < 0.9)
          Some(ValidationIssue(c, "LOCATION", Severity.Info, "LOCATION_style",
            "Inconsistent casing detected (mix of Title/Lower/Upper)",
            math.round(nn * (1 - ratio)), exAt(s"locex_$c"),
            "Standardize to Title Case"))
        else None
      }
    }
    val cross = crossDob.flatMap { case (label, m) =>
      val n = if (row.isNullAt(row.fieldIndex("cross_dob"))) 0L else row.getAs[Long]("cross_dob")
      if (n > 0) Some(ValidationIssue(label, "UNKNOWN", Severity.Warning,
        "CROSS_DOB_AGE_MISMATCH", s"Age does not match DOB (>$n inconsistencies)",
        n, Nil, "Re-derive Age from DOB")) else None
    }.toSeq ++ crossNameEmail.flatMap { case (label, m) =>
      val n = if (row.isNullAt(row.fieldIndex("cross_ne"))) 0L else row.getAs[Long]("cross_ne")
      if (n > 0) Some(ValidationIssue(label, "UNKNOWN", Severity.Info,
        "CROSS_NAME_EMAIL_MISMATCH",
        s"Email does not appear to match Name ($n potential)", n, Nil,
        "Manual verification required")) else None
    }.toSeq
    typed ++ loc ++ cross
  }

  /** V8 — |((runTs − dob)/365.25) − age| > 2, dob parsed multi-format
    * (`validator.py:140-182`); pure column math. */
  def crossDobAgeMask(df: DataFrame, typeMap: Map[String, TypeMetadata],
                      runTs: java.sql.Timestamp): Option[(String, Column)] = {
    import ColumnType._
    for {
      dobCol <- typeMap.toSeq.sortBy(_._1).find(_._2.detectedType == DATE_OF_BIRTH).map(_._1)
      ageCol <- typeMap.toSeq.sortBy(_._1).find(_._2.detectedType == AGE).map(_._1)
    } yield {
      val dob = Cleaners.parseDateMulti(col(dobCol))
      val age = Cleaners.coerceNumeric(col(ageCol))
      val expected = datediff(lit(runTs).cast("date"), dob.cast("date")) / 365.25
      (s"$dobCol <> $ageCol",
        dob.isNotNull && age.isNotNull && abs(expected - age) > 2)
    }
  }

  /** V9 — no name token (len>2) in the email local part, with
    * first-initial+lastname fallback (`validator.py:184-222`) — higher-order
    * functions only, no UDF. */
  def crossNameEmailMask(df: DataFrame, typeMap: Map[String, TypeMetadata]): Option[(String, Column)] = {
    import ColumnType._
    for {
      nameCol <- typeMap.toSeq.sortBy(_._1).find(_._2.detectedType == PERSON_NAME).map(_._1)
      emailCol <- typeMap.toSeq.sortBy(_._1).find(_._2.detectedType == EMAIL).map(_._1)
    } yield {
      val name = lower(col(nameCol).cast("string"))
      val email = lower(col(emailCol).cast("string"))
      val emailUser = substring_index(email, "@", 1)
      val tokens = filter(split(name, "\\s+"), t => length(t) > 2)
      val anyTokenIn = exists(tokens, t => emailUser.contains(t))
      val initialsLast = concat(substring(try_element_at(tokens, lit(1)), 1, 1),
        try_element_at(tokens, lit(-1)))
      val initialsIn = size(tokens) >= 2 && emailUser.contains(initialsLast)
      (s"$nameCol <> $emailCol",
        col(nameCol).isNotNull && col(emailCol).isNotNull &&
        email.contains("@") && size(tokens) > 0 && !anyTokenIn &&
        !coalesce(initialsIn, lit(false)))
    }
  }

  def messageFor(rid: String): String = rid match {
    case "NAME_format" => "Single word names found (potential missing surname)"
    case "PHONE_format" => "Invalid phone format (expected 10 digits)"
    case "EMAIL_format" => "Invalid email format"
    case "DOB_range" => "Future dates detected in DOB"
    case "AGE_range" => "Age out of valid range (0-120)"
    case "GENDER_standard" => "Non-standard gender values"
    case _ => rid
  }
  def fixFor(rid: String): String = rid match {
    case "NAME_format" => "Review manually"
    case "PHONE_format" => "Standardize format"
    case "EMAIL_format" => "Check for typos"
    case "DOB_range" => "Correction needed"
    case "AGE_range" => "Check data source"
    case "GENDER_standard" => "Map to standard values"
    case _ => ""
  }
}

/**
 * Semantic cleaners C27–C36 (`/root/reference/src/semantic_pipeline/cleaner.py`)
 * as pure Column transforms, applied in ONE projection by [[SemanticPipeline]].
 */
object SemanticCleaners {
  import ColumnType._

  /** C27 — name: trim, Title Case, strip non-word chars (`cleaner.py:47-57`). */
  def cleanName(c: Column): Column = {
    val s = regexp_replace(initcap(trim(c.cast("string"))), "[^\\w\\s\\-']", "")
    when(c.isNull, c.cast("string")).otherwise(when(s === "", lit(null).cast("string")).otherwise(s))
  }

  /** C28 — phone: digits-only; 10 digits → region prefix (`cleaner.py:59-76`). */
  def cleanPhone(c: Column, region: String = "IN"): Column = {
    val digits = regexp_replace(c.cast("string"), "\\D", "")
    val prefix = region match { case "US" => "+1-"; case _ => "+91-" }
    when(c.isNull, lit(null).cast("string"))
      .when(length(digits) === 10, concat(lit(prefix), digits))
      .when(digits === "", lit(null).cast("string"))
      .otherwise(digits)
  }

  /** C29 — email: trim + lower (`cleaner.py:78-86`). */
  def cleanEmail(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    when(c.isNull, lit(null).cast("string"))
      .when(s === "", lit(null).cast("string")).otherwise(s)
  }

  /** C30+C34 — date standardize to ISO; Excel serials handled; original
    * preserved on parse failure is C36's variant — here failures → null
    * (`cleaner.py:88-108`). */
  def cleanDate(c: Column): Column =
    date_format(Cleaners.parseDateOrSerial(c), "yyyy-MM-dd")

  /** C31 — age numeric coercion (`cleaner.py:110-114`). */
  def cleanAge(c: Column): Column = c.cast("string").try_cast(org.apache.spark.sql.types.DoubleType)

  /** C32 — location Title Case (`cleaner.py:116-119`). */
  def cleanLocation(c: Column): Column = initcap(trim(c.cast("string")))

  /** C33 — gender mapping (`cleaner.py:121-129`): m/male/man→Male, …, else
    * Unknown (nulls also → Unknown, matching pandas `.fillna('Unknown')`
    * applied after astype(str) maps NaN→"nan"). */
  def cleanGender(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    when(s.isin("m", "male", "man"), "Male")
      .when(s.isin("f", "female", "woman"), "Female")
      .when(s.isin("o", "other"), "Other")
      .otherwise("Unknown")
  }

  /** C35 — age derivation from DOB: floor((runTs − dob)/365.25), never trust
    * the original (`dynamic_cleaner.py:115-147`). */
  def deriveAgeFromDob(dob: Column, runTs: java.sql.Timestamp): Column =
    floor(datediff(lit(runTs).cast("date"),
      Cleaners.parseDateOrSerial(dob).cast("date")) / 365.25)

  /** C36 — DOB normalization to a configured format, original preserved on
    * parse failure (`dynamic_cleaner.py:156-183`). */
  def normalizeDob(c: Column, fmt: String = "dd-MM-yyyy"): Column =
    coalesce(date_format(Cleaners.parseDateOrSerial(c), fmt), c.cast("string"))

  /** Transform for a detected type (pipeline dispatch, `cleaner.py:15-45`). */
  def forType(c: String, t: ColumnType.Value, region: String = "IN"): Option[Column] = t match {
    case PERSON_NAME => Some(cleanName(col(c)))
    case PHONE_NUMBER => Some(cleanPhone(col(c), region))
    case EMAIL => Some(cleanEmail(col(c)))
    case DATE_OF_BIRTH => Some(cleanDate(col(c)))
    case AGE => Some(cleanAge(col(c)))
    case LOCATION => Some(cleanLocation(col(c)))
    case GENDER => Some(cleanGender(col(c)))
    case _ => None
  }
}

/** Quality scorer V11 (`/root/reference/src/semantic_pipeline/scorer.py:10-45`). */
object Scorer {
  case class PenaltyLine(rule: String, severity: String, rows: Long, penalty: Double)
  case class ScoreResult(score: Double, penaltyTotal: Double, breakdown: Seq[PenaltyLine])

  def score(totalRows: Long, issues: Seq[ValidationIssue]): ScoreResult = {
    val t = math.max(totalRows, 1L).toDouble
    val lines = issues.map { i =>
      val w = Severity.weight.getOrElse(i.severity, 1.0)
      val p = math.min((i.rows_affected / t) * w * 10, 15.0)
      PenaltyLine(i.rule_id, i.severity, i.rows_affected,
        math.round(p * 100) / 100.0)
    }
    val penalty = lines.map(_.penalty).sum
    ScoreResult(math.max(0.0, math.round((100.0 - penalty) * 100) / 100.0),
      math.round(penalty * 100) / 100.0, lines)
  }
}

/**
 * EP3 — the full semantic pipeline (`/root/reference/src/semantic_pipeline/
 * pipeline.py:43-82`): detect → validate → score → clean (one projection) →
 * re-validate → re-score.
 */
object SemanticPipeline {
  case class Result(cleaned: DataFrame, typeMap: Map[String, TypeMetadata],
                    issuesBefore: Seq[ValidationIssue], issuesAfter: Seq[ValidationIssue],
                    scoreBefore: Scorer.ScoreResult, scoreAfter: Scorer.ScoreResult,
                    changeLogs: Seq[ChangeLog] = Nil)

  def process(df: DataFrame, runTs: java.sql.Timestamp =
                java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
              region: String = "IN"): Result = {
    val typeMap = Detector.detectTypes(df)
    val transforms = typeMap.toSeq.sortBy(_._1).flatMap { case (c, meta) =>
      SemanticCleaners.forType(c, meta.detectedType, region).map(t => (c, meta, t)) }
    val cleaned = transforms.foldLeft(df) { case (d, (c, _, t)) => d.withColumn(c, t) }
    // The four post-detection statistics (row count, before-issues,
    // change-log counts, after-issues) are INDEPENDENT single-agg jobs that
    // r5 ran back-to-back, so the pipeline's wall time was their sum; they
    // now run concurrently from a small driver pool (guide §2.6). Each
    // job's plan — and so each result — is unchanged.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration.Inf
    val fTotal = Future(df.count())
    val fBefore = Future(SemanticValidators.validate(df, typeMap, runTs))
    val fAfter = Future(SemanticValidators.validate(cleaned, typeMap, runTs))
    // ChangeLog per cleaned column (`types.py:37-42`, `cleaner.py` returns
    // one per operation): rows_changed = cells whose string form changed —
    // ONE agg over the input evaluating old vs new expression per column
    val fChangeLogs: Future[Seq[ChangeLog]] = Future {
      if (transforms.isEmpty) Nil
      else {
        val sentinel = " ∅"
        val aggs = transforms.map { case (c, _, t) =>
          sum((coalesce(col(c).cast("string"), lit(sentinel)) =!=
               coalesce(t.cast("string"), lit(sentinel))).cast("long")).as(c) }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        transforms.map { case (c, meta, _) =>
          val i = row.fieldIndex(c)
          ChangeLog(c, s"clean_${meta.detectedType.toString.toLowerCase}",
            if (row.isNullAt(i)) 0L else row.getLong(i), Nil)
        }.filter(_.rows_changed > 0)
      }
    }
    val total = Await.result(fTotal, Inf)
    val before = Await.result(fBefore, Inf)
    val after = Await.result(fAfter, Inf)
    val changeLogs = Await.result(fChangeLogs, Inf)
    Result(cleaned, typeMap, before, after, Scorer.score(total, before),
      Scorer.score(total, after), changeLogs)
    // finally (not success-path-only): a failing job must not leak the
    // non-daemon pool threads (review r6)
    } finally pool.shutdown()
  }

  /** The EP3 report artifact, matching `report_demo_data.json`'s shape:
    * detected_types → initial_quality (score + breakdown + issues) →
    * cleaning_logs → final_quality. */
  def reportJson(r: Result): String = {
    import graft.stats.RunReportJson.enc
    import scala.collection.immutable.ListMap
    def scoreMap(s: Scorer.ScoreResult): Map[String, Any] = ListMap(
      "score" -> s.score, "penalty_total" -> s.penaltyTotal,
      "breakdown" -> s.breakdown.map(l => ListMap(
        "rule" -> l.rule, "severity" -> l.severity, "rows" -> l.rows,
        "penalty" -> l.penalty)))
    def issueMap(i: ValidationIssue): Map[String, Any] = ListMap(
      "column" -> i.column, "detected_type" -> s"ColumnType.${i.detected_type}",
      "severity" -> i.severity, "rule_id" -> i.rule_id, "message" -> i.message,
      "rows_affected" -> i.rows_affected, "examples" -> i.examples,
      "suggested_fix" -> i.suggested_fix)
    def quality(issues: Seq[ValidationIssue], s: Scorer.ScoreResult) = ListMap(
      "score" -> scoreMap(s), "issue_count" -> issues.size,
      "issues" -> issues.map(issueMap))
    enc(ListMap(
      "detected_types" -> r.typeMap.toSeq.sortBy(_._1).map { case (c, m) =>
        c -> ListMap("type" -> m.detectedType.toString,
          "confidence" -> m.confidence) }.toMap,
      "initial_quality" -> quality(r.issuesBefore, r.scoreBefore),
      "cleaning_logs" -> r.changeLogs.map(l => ListMap(
        "column" -> l.column, "operation" -> l.operation,
        "rows_changed" -> l.rows_changed, "examples" -> l.examples)),
      "final_quality" -> quality(r.issuesAfter, r.scoreAfter)))
  }
}
