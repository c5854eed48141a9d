package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.RuleSpec._
import graft.rules.BoundRule

/**
 * Stage-level attribution of the 8→32 engine scaling gap (VERDICT r5 item 1):
 * runs the EXACT ScalingBench engine leg (same session factory, same rule
 * suite + content passthroughs, same noop sinks) at local[8] and local[32]
 * in ONE JVM, and prints per-stage task-metric totals at each width —
 * executor run/CPU, GC, shuffle read/write bytes AND times (fetch wait,
 * write time), task (de)serialization, spill, peak execution memory — so
 * the width where a stage stops scaling is named from evidence, not
 * inferred from aggregate CPU inflation.
 *
 * Env: SPARK_GRAFT_BENCH_DOCS (default 40 M), WIDTHS (default "8,32"),
 * REPS per width (default 2; min-leg's stages reported).
 *
 * Diagnostic main — the per-round trend numbers still come from graft.Bench.
 */
object EngineStageProfiler {

  case class StageRow(id: Int, name: String, tasks: Int,
                      runMs: Long, cpuNs: Long, gcMs: Long,
                      deserMs: Long, resSerMs: Long,
                      inB: Long, srB: Long, swB: Long,
                      fetchWaitMs: Long, swTimeNs: Long,
                      memSpill: Long, diskSpill: Long, peakMem: Long)

  final class StageProbe extends SparkListener {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo; val m = si.taskMetrics
      if (m != null) rows.add(StageRow(si.stageId, si.name, si.numTasks,
        m.executorRunTime, m.executorCpuTime, m.jvmGCTime,
        m.executorDeserializeTime, m.resultSerializationTime,
        m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten,
        m.shuffleReadMetrics.fetchWaitTime, m.shuffleWriteMetrics.writeTime,
        m.memoryBytesSpilled, m.diskBytesSpilled, m.peakExecutionMemory))
    }
    def drain(): Seq[StageRow] = {
      import scala.jdk.CollectionConverters._
      val out = rows.asScala.toSeq; rows.clear(); out
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "40000000").toLong
    val widths = sys.env.getOrElse("WIDTHS", "8,32").split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("REPS", "2").toInt
    val docsPath = s"/tmp/graft_bench_docs_$nDocs"

    locally {
      val s = graft.Bench.engineSession(widths.max)
      if (!new java.io.File(s"$docsPath/_SUCCESS").exists())
        graft.fixtures.Fixtures.docs(s, nDocs, 32).write.mode("overwrite").parquet(docsPath)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    val rules = Seq(BoundRule(Required("doc_id")), BoundRule(SpanOffsetsMonotonic()),
      BoundRule(SpanFieldConsistency()), BoundRule(SpansNonEmpty()))

    def leg(cores: Int): (Double, Seq[StageRow]) = {
      val s = graft.Bench.engineSession(cores)
      val probe = new StageProbe
      s.sparkContext.addSparkListener(probe)
      val docs = s.read.parquet(docsPath)
      val assets = graft.fixtures.Fixtures.assets(s)
      val prepped = docs.withColumn("__text",
        graft.functions.F.spanText(col("spans")))
      val cfg = graft.engine.EngineConfig(rules, passthroughExprs = Seq(
        graft.functions.F.tokenStats(col("__text")).as("__ts"),
        graft.functions.F.minhashSig(col("__text"), 8, 3, portable = false).as("__mh"),
        graft.functions.F.simhash(col("__text"), 32, portable = false).as("__sh")))
      val run = new graft.engine.ValidationRun(s, cfg)
      val t0 = System.nanoTime()
      val (verdicts, viols) = run.run(prepped, Some(assets))
      viols.write.format("noop").mode("overwrite").save()
      verdicts.write.format("noop").mode("overwrite").save()
      run.lastNarrow.get
        .select(col("doc_id"), col("part"), col("__ts"), col("__mh"), col("__sh"))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      viols.unpersist(); run.unpersistAll()
      Thread.sleep(700)
      val rows = probe.drain()
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (sec, rows)
    }

    def fmt(r: StageRow): String =
      f"  stage ${r.id}%4d tasks=${r.tasks}%4d run=${r.runMs / 1e3}%8.2fs " +
      f"cpu=${r.cpuNs / 1e9}%8.2fs gc=${r.gcMs / 1e3}%6.2fs " +
      f"deser=${r.deserMs / 1e3}%5.2fs resSer=${r.resSerMs / 1e3}%5.2fs " +
      f"in=${r.inB / 1e9}%6.2fGB sr=${r.srB / 1e9}%6.2fGB sw=${r.swB / 1e9}%6.2fGB " +
      f"fetchWait=${r.fetchWaitMs / 1e3}%5.2fs swTime=${r.swTimeNs / 1e9}%5.2fs " +
      f"spillMem=${r.memSpill / 1e9}%5.2fGB spillDisk=${r.diskSpill / 1e9}%5.2fGB " +
      f"peakMem=${r.peakMem / 1e9}%5.2fGB  ${r.name.take(60)}"

    widths.foreach { w =>
      val legs = (1 to reps).map(_ => leg(w))
      val (sec, rows) = legs.minBy(_._1)
      println(f"== width $w: best leg $sec%.2f s " +
        f"(all: ${legs.map(l => f"${l._1}%.1f").mkString(", ")})")
      rows.sortBy(_.id).foreach(r => println(fmt(r)))
      val totCpu = rows.map(_.cpuNs).sum / 1e9
      val totRun = rows.map(_.runMs).sum / 1e3
      val totGc = rows.map(_.gcMs).sum / 1e3
      val totFetch = rows.map(_.fetchWaitMs).sum / 1e3
      println(f"  TOTAL run=$totRun%.1fs cpu=$totCpu%.1fs gc=$totGc%.1fs fetchWait=$totFetch%.1fs")
    }
  }
}
