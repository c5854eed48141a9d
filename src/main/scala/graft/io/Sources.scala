package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.clean.Cleaners

/**
 * Sources & sinks (SURVEY §2.1 S1–S16). The reference's multi-strategy
 * loaders collapse into Spark reader options; the structural checks and
 * sanitization that follow a load are re-expressed as one stats pass +
 * one projection.
 */
object Sources {

  /** S2 — encoding detection (chardet analogue,
    * `/root/reference/src/utils/file_loader.py:470-508`): a driver-side sniff
    * of the head bytes — BOM signatures first, then a UTF-8 validity scan,
    * falling back to latin-1 (which accepts any byte stream, like the
    * reference's final fallback). Confidence mirrors chardet's contract. */
  case class SniffedEncoding(encoding: String, confidence: Double)
  def sniffEncoding(path: String, sampleBytes: Int = 64 * 1024): SniffedEncoding = {
    val in = new java.io.FileInputStream(path)
    val buf = try {
      val b = new Array[Byte](sampleBytes)
      val n = math.max(in.read(b), 0)
      java.util.Arrays.copyOf(b, n)
    } finally in.close()
    def startsWith(sig: Int*) =
      buf.length >= sig.length && sig.indices.forall(i => (buf(i) & 0xff) == sig(i))
    if (startsWith(0xEF, 0xBB, 0xBF)) SniffedEncoding("UTF-8", 1.0)
    else if (startsWith(0xFF, 0xFE)) SniffedEncoding("UTF-16LE", 1.0)
    else if (startsWith(0xFE, 0xFF)) SniffedEncoding("UTF-16BE", 1.0)
    else {
      // UTF-8 validity scan: every multi-byte lead must be followed by the
      // right number of continuation bytes
      var i = 0; var valid = true; var sawMulti = false
      while (valid && i < buf.length) {
        val b = buf(i) & 0xff
        val cont = if (b < 0x80) 0
          else if (b >= 0xC2 && b <= 0xDF) 1
          else if (b >= 0xE0 && b <= 0xEF) 2
          else if (b >= 0xF0 && b <= 0xF4) 3
          else -1
        if (cont < 0) valid = false
        else {
          if (cont > 0) sawMulti = true
          var j = 1
          while (valid && j <= cont) {
            if (i + j >= buf.length) () // truncated tail: benign
            else if ((buf(i + j) & 0xC0) != 0x80) valid = false
            j += 1
          }
          i += cont + 1
        }
      }
      if (valid) SniffedEncoding("UTF-8", if (sawMulti) 0.99 else 0.75)
      else SniffedEncoding("ISO-8859-1", 0.5)
    }
  }

  /** S1/S3 — CSV with the reference's resilience knobs: header, permissive
    * parsing, optional delimiter; delimiter sniffing happens driver-side on a
    * head sample when `sniffDelimiter` (csv.Sniffer analogue:
    * `/root/reference/src/utils/file_loader.py:511-567`). Pass
    * `encoding = sniffEncoding(path).encoding` to chain S2 → S1. */
  def csv(spark: SparkSession, path: String, delimiter: Option[String] = None,
          encoding: String = "UTF-8", sniffDelimiter: Boolean = false): DataFrame = {
    val sep = delimiter.orElse {
      if (!sniffDelimiter) None
      else {
        val head = scala.io.Source.fromFile(path, encoding)
        val lines = try head.getLines().take(5).toList finally head.close()
        val cands = Seq(",", ";", "\t", "|")
        // frequency+variance heuristic: the candidate with the highest
        // consistent per-line count wins (file_loader.py:541-562)
        Some(cands.maxBy { c =>
          val counts = lines.map(_.count(_.toString == c))
          if (counts.isEmpty || counts.exists(_ != counts.head)) counts.sum
          else counts.sum * 10
        })
      }
    }.getOrElse(",")
    spark.read
      .option("header", "true").option("sep", sep)
      .option("encoding", encoding).option("mode", "PERMISSIVE")
      .option("inferSchema", "true")
      .csv(path)
  }

  /** S6 — parquet. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S7 — JSON (JSONL by default; `multiLine` for document JSON —
    * orient auto-detect collapses into Spark's reader). */
  def json(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame =
    spark.read.option("multiLine", multiLine.toString).json(path)

  /** S9 — directory batch load: glob of per-file loads, one source per
    * format (`file_loader.py:1437-1474`); Spark reads the glob natively. */
  def directory(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.read.format(format).option("header", "true").load(dir)

  /** S10 — post-load structural validation (`file_loader.py:968-1040`):
    * empty df, duplicate/suspicious column names, high missingness. */
  case class LoadValidation(rows: Long, emptyDf: Boolean,
                            duplicateColumns: Seq[String],
                            suspiciousColumns: Seq[String],
                            highMissingPct: Seq[(String, Double)])
  def validateLoad(df: DataFrame): LoadValidation = {
    val rows = df.count()
    val dups = df.columns.groupBy(_.toLowerCase).filter(_._2.length > 1)
      .keys.toSeq.sorted
    val suspicious = df.columns.filter(c =>
      c.trim.isEmpty || c.startsWith("Unnamed") || c.matches("_c\\d+")).toSeq
    val nulls =
      if (rows == 0) Nil
      else {
        // duplicate (case-insensitive) names make col(name) ambiguous —
        // rename positionally to unique temp names for the stats pass
        val tmp = df.toDF(df.columns.indices.map(i => s"__c$i"): _*)
        val row = tmp.select(tmp.columns.map(c =>
          sum(col(c).isNull.cast("long")).as(c)): _*).collect()(0)
        df.columns.toSeq.zipWithIndex
          .map { case (c, i) => c -> row.getAs[Long](s"__c$i") * 100.0 / rows }
          .filter(_._2 >= 50.0)
      }
    LoadValidation(rows, rows == 0, dups, suspicious, nulls)
  }

  /** S11 — post-load sanitization (`file_loader.py:1042-1080`): snake_case
    * headers, drop all-null rows, drop all-null columns. */
  def sanitize(df: DataFrame): DataFrame = {
    val renamed = Cleaners.renameHeaders(df, snakeCase = true)
    val noNullRows = renamed.na.drop("all")
    // all-null column detection: one agg
    val row = noNullRows.select(noNullRows.columns.map(c =>
      sum(col(c).isNotNull.cast("long")).as(c)): _*).collect()(0)
    val keep = noNullRows.columns.filter(c => row.getAs[Long](c) > 0L)
    noNullRows.select(keep.map(col).toSeq: _*)
  }

  /** S12 — CSV export with placeholder→null normalization first
    * (`/root/reference/src/engine/report/export.py:83-97`). */
  def exportCsv(df: DataFrame, path: String): Unit = {
    val strCols = df.schema.fields.filter(_.dataType ==
      org.apache.spark.sql.types.StringType).map(_.name)
    val cleaned = strCols.foldLeft(df)((d, c) =>
      d.withColumn(c, Cleaners.standardizeNulls(col(c))))
    cleaned.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** S15 — export naming contract (`/root/reference/src/config_loader.py:179-210`,
    * README.md:176-192): `{name}_cleaned_data.{ext}` under outDir; callers
    * gate on pipeline status (writes blocked on FAIL). */
  def cleanedDataPath(outDir: String, datasetName: String, ext: String): String =
    s"$outDir/${datasetName}_cleaned_data.$ext"

  /** S13/S14 analogue — the reference's 4-sheet Excel workbook becomes 4
    * tables under one run directory (Raw / Clean / Validation / Corrections),
    * plus a JSON run report. */
  def writeRunArtifacts(outDir: String, name: String,
                        raw: DataFrame, clean: DataFrame,
                        validation: DataFrame,
                        corrections: Option[DataFrame] = None,
                        gateFailed: Boolean = false): Unit = {
    if (gateFailed) return // S15: block exports on FAIL
    raw.write.mode(SaveMode.Overwrite).parquet(s"$outDir/${name}_raw")
    clean.write.mode(SaveMode.Overwrite)
      .parquet(cleanedDataPath(outDir, name, "parquet"))
    validation.write.mode(SaveMode.Overwrite).parquet(s"$outDir/${name}_validation")
    corrections.foreach(_.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/${name}_corrections"))
  }

  /** S16 — audit-ledger append (Dataset[AuditEntry] → parquet). */
  def appendAudit(spark: SparkSession, entries: Seq[graft.core.AuditEntry],
                  dir: String): Unit = {
    import spark.implicits._
    if (entries.nonEmpty)
      entries.toDF().write.mode(SaveMode.Append).parquet(dir)
  }
}
