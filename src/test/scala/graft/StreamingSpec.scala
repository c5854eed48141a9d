package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.RuleSpec._
import graft.core.{Doc, Span}
import graft.fixtures.Fixtures
import graft.rules.BoundRule
import graft.streaming.StreamingValidation

/**
 * Structured Streaming surface (SURVEY §2.12 bonus): the row/span rules are
 * pure projections, so the STREAMING violation output must equal the batch
 * engine's output on the same documents — asserted here via MemoryStream.
 */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val rowRules = Seq(
    BoundRule(Required("doc_id")), BoundRule(SpanOffsetsMonotonic()),
    BoundRule(SpanFieldConsistency()), BoundRule(SpansNonEmpty()))

  test("streaming violations equal the batch engine's row+RI violations") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val assets = Fixtures.goldenAssetsDf(spark)
    val out = StreamingValidation.violationsStream(
      mem.toDF(), rowRules, Some(assets))
    val q = out.writeStream.format("memory").queryName("viols_stream")
      .outputMode("append").start()
    try {
      mem.addData(Fixtures.goldenDocs)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("viols_stream")
      .select($"rule_id", $"doc_id").as[(String, String)].collect()
      .map { case (r, d) => (r, Option(d).getOrElse("«null»")) }.toSet

    // batch reference: same rules, same input, uniqueness off (global state
    // is the batch engine's job — see StreamingValidation scaladoc)
    val run = new engine.ValidationRun(spark,
      engine.EngineConfig(rules = rowRules, uniquenessKey = None))
    val (_, batchViols) = run.run(Fixtures.goldenDocsDf(spark), Some(assets))
    val want = batchViols.select($"rule_id", $"doc_id").as[(String, String)]
      .collect()
      .map { case (r, d) => (r, Option(d).getOrElse("«null»")) }.toSet
    batchViols.unpersist(); run.unpersistAll()
    assert(got === want)
  }

  test("windowed verdicts: per-(window, part) counts match the batch totals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val withTs = mem.toDF().withColumn("ts",
      to_timestamp(lit("2026-01-01 00:00:30")))
    val verdicts = StreamingValidation.windowedVerdicts(
      withTs, rowRules, "ts", "1 minute")
    val q = verdicts.writeStream.format("memory").queryName("verd_stream")
      .outputMode("complete").start()
    try {
      mem.addData(Fixtures.goldenDocs)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("verd_stream")
      .select($"part", $"total_rows", $"failed", $"status")
      .as[(Int, Long, Long, String)].collect().toSet
    // golden fixture: 12 docs, parts {0: 7 docs, 1: 5}; row-rule failures
    // (no uniqueness/RI in the windowed pass): part 0 = null id, d08 dup
    // offsets (strictly-increasing rule), d10 media span carrying text;
    // part 1 = blank id, d07 out-of-order, d09 empty, d11 text span
    // carrying a media_ref (field consistency)
    assert(got === Set((0, 7L, 3L, "FAIL"), (1, 5L, 4L, "FAIL")))
  }

  test("dedupStream drops duplicate doc_ids within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val withTs = mem.toDF().withColumn("ts",
      to_timestamp(lit("2026-01-01 00:00:30")))
    val out = StreamingValidation.dedupStream(
      withTs.where($"doc_id".isNotNull), "doc_id", "ts")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(Fixtures.goldenDocs)
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").select($"doc_id").as[String].collect()
    assert(ids.length === ids.distinct.length, "duplicates survived")
    // both dup-1 rows arrived in the batch; exactly one survives
    assert(ids.count(_ == "dup-1") === 1)
  }

  test("global-state rules are rejected on streams with a actionable message") {
    val ex = intercept[IllegalArgumentException] {
      StreamingValidation.annotate(Fixtures.goldenDocsDf(spark),
        Seq(BoundRule(Unique("doc_id"))))
    }
    assert(ex.getMessage.contains("unique(doc_id)"))
    assert(ex.getMessage.contains("batch engine"))
  }
}
