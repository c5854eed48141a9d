package graft

import org.apache.spark.sql.SparkSession
import graft.core.RuleSpec._
import graft.engine.{EngineConfig, ValidationRun}
import graft.fixtures.Fixtures
import graft.rules.BoundRule

/**
 * spark-submit entry point: validate an interleaved-docs table end-to-end
 * (north rule contract — per-partition verdicts + violation rows + resumable
 * ledger, runnable at two cluster sizes).
 *
 * Usage:
 *   RunValidation <outDir> [--docs <parquetPath>] [--assets <parquetPath>]
 *                 [--gen <nDocs>] [--parts <n>] [--resume] [--master local[N]]
 *                 [--sketch]   // also persist per-partition KLL quantile
 *                              // sketches (span count per doc) + HLL
 *                              // distinct-count registers (doc_id) + MG
 *                              // heavy-hitter summaries (first span kind)
 *                              // in the ledger for zero-scan cross-run
 *                              // drift checks (numeric / cardinality /
 *                              // categorical); sketch inputs ride the
 *                              // rule-pass scan
 *
 * With `--gen N` the deterministic fixture generator supplies the input
 * (FIXTURES.md F1/F2); otherwise point --docs/--assets at parquet tables with
 * the BASELINE.json `input_hint` schema.
 */
object RunValidation {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 1).collect {
      case Array(k, v) if k.startsWith("--") => k -> v }.toMap
    val outDir = args.headOption.getOrElse(sys.error("usage: RunValidation <outDir> [...]"))
    val resume = args.contains("--resume")
    val builder = SparkSession.builder()
      .appName("graft-validation")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // master comes from spark-submit normally; default local for direct runs
    val spark = (opts.get("--master") match {
      case Some(m) => builder.master(m)
      case None if sys.props.contains("spark.master") => builder
      case None => builder.master("local[*]")
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nParts = opts.get("--parts").map(_.toInt).getOrElse(8)
    val docs = opts.get("--docs").map(spark.read.parquet(_))
      .getOrElse(Fixtures.docs(spark, opts.get("--gen").map(_.toLong).getOrElse(10000L), nParts))
    val assets = Some(opts.get("--assets").map(spark.read.parquet(_))
      .getOrElse(Fixtures.assets(spark)))

    val cfg = EngineConfig(
      rules = Seq(
        BoundRule(Required("doc_id")),
        BoundRule(SpanOffsetsMonotonic()),
        BoundRule(SpanFieldConsistency()),
        BoundRule(SpansNonEmpty())),
      ledgerDir = Some(s"$outDir/_ledger"),
      sketchExprs =
        if (args.contains("--sketch"))
          Map("n_spans" -> org.apache.spark.sql.functions
            .size(org.apache.spark.sql.functions.col("spans")).cast("double"))
        else Map.empty,
      hllSketchExprs =
        if (args.contains("--sketch"))
          Map("doc_id" -> org.apache.spark.sql.functions.col("doc_id"))
        else Map.empty,
      mgSketchExprs =
        if (args.contains("--sketch"))
          Map("first_kind" -> org.apache.spark.sql.functions
            .try_element_at(org.apache.spark.sql.functions.col("spans.kind"),
              org.apache.spark.sql.functions.lit(1)))
        else Map.empty)
    val t0 = System.nanoTime()
    new ValidationRun(spark, cfg).runAndWrite(docs, assets, outDir, resume)
    val secs = (System.nanoTime() - t0) / 1e9
    val verdicts = spark.read.parquet(s"$outDir/verdicts")
    val nDocs = verdicts.agg(org.apache.spark.sql.functions.sum("total_rows"))
      .collect()(0).getLong(0)
    println(f"[graft] validated $nDocs docs in $secs%.2f s (${nDocs / secs}%.0f docs/sec)")
    verdicts.orderBy("part").show(50, false)
    spark.stop()
  }
}
