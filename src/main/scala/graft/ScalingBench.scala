package graft

import org.apache.spark.sql.SparkSession
import graft.core.RuleSpec._
import graft.rules.BoundRule

/**
 * Two-cluster-size scaling evidence (BASELINE.md protocol): the same full
 * validation job on the same input at local[N] and local[4N], alternating
 * legs inside one JVM (shared JIT + page cache ⇒ comparable steady state),
 * min-of-reps per leg. Prints one JSON line with both throughputs and the
 * scaling efficiency  = thr(4N) / (4 × thr(N)).
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "40000000").toLong
    val small = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val big = small * 4
    val docsPath = s"/tmp/graft_bench_docs_$nDocs"

    // one session factory shared with the driver-run Bench engine leg, so
    // the two headline paths are config-identical by construction
    def session(cores: Int): SparkSession = Bench.engineSession(cores)

    // generate once
    locally {
      val s = session(big)
      // _SUCCESS check so an interrupted prior write regenerates (ADVICE r2)
      if (!new java.io.File(s"$docsPath/_SUCCESS").exists())
        fixtures.Fixtures.docs(s, nDocs, 32).write.mode("overwrite").parquet(docsPath)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    val rules = Seq(BoundRule(Required("doc_id")), BoundRule(SpanOffsetsMonotonic()),
      BoundRule(SpanFieldConsistency()), BoundRule(SpansNonEmpty()))

    /** (wall sec, GC sec, process-CPU sec) for one leg — GC/CPU deltas prove
      * (or refute) the allocation-bound explanation for sub-linear scaling. */
    def leg(cores: Int): (Double, Double, Double) = {
      val s = session(cores)
      import org.apache.spark.sql.functions._
      import scala.jdk.CollectionConverters._
      def gcMs: Long = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      def cpuNs: Long = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime
      val docs = s.read.parquet(docsPath)
      val assets = fixtures.Fixtures.assets(s)
      val run = new engine.ValidationRun(s, engine.EngineConfig(rules))
      val (gc0, cpu0) = (gcMs, cpuNs)
      val t0 = System.nanoTime()
      // 1) structural rule suite: verdicts + violations
      val (verdicts, viols) = run.run(docs, Some(assets))
      viols.write.format("noop").mode("overwrite").save()
      verdicts.write.format("noop").mode("overwrite").save()
      viols.unpersist()
      run.unpersistAll()
      // 2) content rules over the interleaved text (full-suite analogue):
      //    token stats, quality inputs, fingerprint, minhash + simhash.
      //    Text extraction is the tight-loop SpanTextConcat (the interpreted
      //    filter→transform→concat_ws HOF tree dominated this stage's CPU),
      //    materialized by a FIRST projection so the three stat expressions
      //    share it (CodegenFallback children don't share subexpressions).
      docs.select(col("doc_id"), col("part"),
          graft.functions.F.spanText(col("spans")).as("text"))
        .select(col("doc_id"), col("part"),
          graft.functions.F.tokenStats(col("text")).as("ts"),
          graft.functions.F.minhashSig(col("text"), 8, 3, portable = false).as("mh"),
          graft.functions.F.simhash(col("text"), 32, portable = false).as("sh"))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val (gcSec, cpuSec) = ((gcMs - gc0) / 1e3, (cpuNs - cpu0) / 1e9)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (sec, gcSec, cpuSec)
    }

    // alternate legs; first pair is warmup, then measured pairs (min-of-reps
    // per width — this sandbox shows multi-x excursions on identical plans)
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    val order = Seq(big, small) ++ Seq.fill(reps)(Seq(big, small)).flatten
    val times = order.map(c => c -> leg(c))
    // min over ALL legs including the warmup pair: a warmup leg can only be
    // slower than steady state (JIT/page cache), so taking the min is safe —
    // and this sandbox's multi-minute slow episodes can land on ANY leg, so
    // discarding legs only throws away evidence
    def best(c: Int) = times.filter(_._1 == c).map(_._2._1).min
    val (tBig, tSmall) = (best(big), best(small))
    val (thrBig, thrSmall) = (nDocs / tBig, nDocs / tSmall)
    val eff = thrBig / (4.0 * thrSmall)
    val legsStr = times.map { case (c, (t, g, u)) =>
      f"$c:$t%.1fs(gc=$g%.1f,cpu=$u%.0f)" }.mkString(",")
    println(f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_small":$small,"n_big":$big,"docs":$nDocs,"sec_small":$tSmall%.2f,"sec_big":$tBig%.2f,"docs_per_sec_small":$thrSmall%.0f,"docs_per_sec_big":$thrBig%.0f,"all_legs":"$legsStr"}""")
  }
}
