package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for every SparkEntry query to
  * plans/<TAG>/<query>_<SUFFIX>.txt (guide §7.2). Env: TAG (default r06),
  * SUFFIX (before/after), Q (comma-filter). Queries that collect() during
  * plan construction still produce the plan of their RETURNED frame. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("TAG", "r06")
    val suffix = sys.env.getOrElse("SUFFIX", "before")
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
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"plans/$tag/${name}_$suffix.txt"), plan)
          println(s"wrote plans/$tag/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"FAILED $name: ${e.getMessage}") }
      }
    spark.stop()
  }
}
