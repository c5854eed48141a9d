package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Per-query profiler (guide §1/§7): runs selected SparkEntry queries in a
 * session configured IDENTICALLY to Bench's per-query session, with a job
 * listener recording every job's wall time + stage task metrics, so the time
 * of a slow query can be attributed to a specific job/stage instead of
 * guessed. Reads Q=comma-separated query names (default: all), LEGS=reps.
 *
 * This is a diagnostic main, not a bench: numbers quoted in
 * OPTIMIZATION_r06.md come from graft.Bench / the committed artifacts.
 */
object ProfileQueries {

  final class JobProbe extends SparkListener {
    case class JobRec(id: Int, desc: String, var ms: Long = -1,
                      start: Long = System.nanoTime())
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val d = Option(js.properties)
        .map(_.getProperty("spark.job.description", "")).getOrElse("")
      jobs.put(js.jobId, JobRec(js.jobId, d))
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val r = jobs.get(je.jobId)
      if (r != null) r.ms = (System.nanoTime() - r.start) / 1000000
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val tm = si.taskMetrics
      if (tm != null) {
        val s = f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"exec=${tm.executorRunTime / 1e3}%7.2fs cpu=${tm.executorCpuTime / 1e9}%7.2fs " +
          f"gc=${tm.jvmGCTime / 1e3}%5.2fs in=${tm.inputMetrics.bytesRead / 1e6}%8.1fMB " +
          f"sr=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
          f"sw=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB  ${si.name}"
        stages.add((si.stageId, s))
      }
    }
    def report(): Unit = {
      import scala.jdk.CollectionConverters._
      println("  jobs:")
      jobs.values.asScala.toSeq.sortBy(_.id).foreach { r =>
        println(f"    job ${r.id}%4d ${r.ms}%6d ms  ${r.desc.take(90)}") }
      println("  stages:")
      stages.asScala.toSeq.sortBy(_._1).foreach { case (_, s) => println("    " + s) }
      jobs.clear(); stages.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val legs = sys.env.getOrElse("LEGS", "2").toInt
    val only = sys.env.get("Q").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probe = new JobProbe
    spark.sparkContext.addSparkListener(probe)
    // same warmup as Bench
    Seq("lineitem", "orders", "events", "documents", "embeddings", "part",
      "customer").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    probe.jobs.clear(); probe.stages.clear()
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    qs.foreach { case (name, fn) =>
      (1 to legs).foreach { leg =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = (System.nanoTime() - t1) / 1e9
        println(f"== $name leg $leg: build=$tBuild%.2fs exec=$tExec%.2fs total=${tBuild + tExec}%.2fs")
        if (leg == legs) probe.report() else { probe.jobs.clear(); probe.stages.clear() }
      }
    }
    spark.stop()
  }
}
