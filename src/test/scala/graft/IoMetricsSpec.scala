package graft

import org.apache.spark.sql.functions._
import graft.io.Sources
import graft.stats.Metrics
import graft.clean.RuleGenerator
import graft.fixtures.Fixtures

class IoMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("post-load validation flags empties, dup/suspicious names, high nulls (S10)") {
    val df = Seq((Some("a"), None: Option[String], 1),
                 (Some("b"), None, 2),
                 (None, None, 3))
      .toDF("Name", "name", "_c0")
    val v = Sources.validateLoad(df)
    assert(v.rows === 3 && !v.emptyDf)
    assert(v.duplicateColumns === Seq("name"))
    assert(v.suspiciousColumns === Seq("_c0"))
    assert(v.highMissingPct.map(_._1).contains("name"))
  }

  test("sanitize: snake_case headers, all-null rows and columns dropped (S11)") {
    val df = Seq((Some("a"), None: Option[Int], Some(1)),
                 (None: Option[String], None, None: Option[Int]),
                 (Some("b"), None, Some(2)))
      .toDF("  Col Name  ", "All Null", "keep_me")
    val out = Sources.sanitize(df)
    assert(out.columns.toSeq === Seq("col_name", "keep_me"))
    assert(out.count() === 2)
  }

  test("export naming contract + FAIL gate (S15)") {
    assert(Sources.cleanedDataPath("/out", "sales", "parquet") ===
      "/out/sales_cleaned_data.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    val df = Seq(1, 2).toDF("x")
    Sources.writeRunArtifacts(dir, "t", df, df, df, gateFailed = true)
    assert(!new java.io.File(s"$dir/t_raw").exists())   // blocked on FAIL
    Sources.writeRunArtifacts(dir, "t", df, df, df)
    assert(new java.io.File(s"$dir/t_raw").exists())
    assert(new java.io.File(s"$dir/t_cleaned_data.parquet").exists())
  }

  test("csv round trip with export normalization (S1/S12)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val df = Seq(("a", "N/A"), ("b", "ok")).toDF("k", "v")
    Sources.exportCsv(df, s"$dir/out")
    val back = Sources.csv(spark, s"$dir/out")
    assert(back.count() === 2)
    assert(back.where($"v".isNull).count() === 1)   // N/A normalized to null
  }

  test("completeness / validity / uniqueness metrics (A16-A19)") {
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), Some(1.0)),
                 (None, Some(Double.PositiveInfinity)), (Some(""), None))
      .toDF("s", "d")
    val comp = Metrics.completeness(df)
    assert(comp.totalCells === 8 && comp.missingCells === 2)
    assert(comp.completeRows === 2)
    val (valid, _) = Metrics.validityAndConsistency(df)
    assert(valid.infiniteValues === 1 && valid.emptyStrings === 1)
    val uniq = Metrics.uniqueness(df)
    assert(uniq.duplicateRowPct === 25.0)   // 1 dup of 4 rows
  }

  test("keyed cell diff counts changes per column (A27)") {
    val raw = Seq((1, "a", 10), (2, "b", 20), (3, null: String, 30)).toDF("id", "s", "n")
    val clean = Seq((1, "a", 10), (2, "B", 20), (3, "filled", 31)).toDF("id", "s", "n")
    val diff = Metrics.cellDiff(raw, clean, "id")
    assert(diff("s") === 2)   // b→B and null→filled
    assert(diff("n") === 1)   // 30→31
  }

  test("overall weighted score bounded and sane (A21)") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("s", "d")
    val (dims, score) = Metrics.qualityReport(df)
    assert(score > 80.0 && score <= 100.0)
  }

  test("rule generator: semantic bindings + baseline score (C38/A24/V10)") {
    val people = Fixtures.people(spark)
    val gen = RuleGenerator.generate(people)
    val byCol = gen.columns.map(c => c.column -> c).toMap
    assert(byCol("DOB").semanticType === "DOB")
    assert(byCol("Age").handleSemantic === Some("calculate_age_from_dob"))
    assert(byCol("Age").dobSourceColumn === Some("DOB"))
    assert(byCol("Email").handleSemantic === Some("validate_email"))
    assert(byCol("Phone").handleSemantic === Some("validate_phone"))
    assert(gen.qualityScore >= 0.0 && gen.qualityScore <= 100.0)
    // V10: DOB/Age share Excel serials in 2 of 6 rows (33%) ⇒ alert fires
    assert(gen.qualityAlerts.nonEmpty)
  }
}
