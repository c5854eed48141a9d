package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.RuleSpec._
import graft.rules.{BoundRule, ValidationEngine}

/** Ad-hoc engine profiler: times each sub-plan of ValidationRun separately. */
object ProfileEngine {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("N", "2000000").toLong
    val spark = SparkSession.builder().master("local[" + sys.env.getOrElse("CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"/tmp/graft_bench_docs_$nDocs"
    if (!new java.io.File(path).exists())
      graft.fixtures.Fixtures.docs(spark, nDocs, 32).write.mode("overwrite").parquet(path)
    val docs = spark.read.parquet(path)
    val assets = graft.fixtures.Fixtures.assets(spark)
    val rules = Seq(BoundRule(Required("doc_id")), BoundRule(SpanOffsetsMonotonic()),
      BoundRule(SpanFieldConsistency()), BoundRule(SpansNonEmpty()))
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      time("scan only")(noop(docs))
      time("span checks projection")(noop(
        docs.select(col("doc_id"), graft.functions.F.spanChecks(col("spans")).as("c"))))
      time("annotate (all row rules)")(noop(ValidationEngine.annotate(docs, rules)))
      time("rowViolations")(noop(ValidationEngine.violations(docs, rules, "doc_id", "part")))
      time("unique salted agg")(noop(
        graft.engine.UniquenessCheck.violations(docs, "doc_id", "part")))
      time("ref integrity")(noop(
        graft.engine.ReferentialIntegrity.violations(docs, assets)))
      time("full run")(
        { val (v, vi) = new graft.engine.ValidationRun(spark,
            graft.engine.EngineConfig(rules)).run(docs, Some(assets))
          noop(vi); noop(v); vi.unpersist() })
    }
    spark.stop()
  }
}
