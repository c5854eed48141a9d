package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Text

/**
 * Micro-benchmark: hyperplane-LSH bucket computation, round-1 formulation
 * (md5 per (row × plane × dim) through interpreted HOFs) vs the round-2
 * literal-plane dot product — isolated from scan/join overhead, at realistic
 * embedding dimensionality. Prints one JSON line.
 *
 * The sf0.1 per-query timings can't show this win (the 500-row × 64-dim
 * embeddings table costs ~2 s of fixed overhead either way); this main
 * measures the expression itself at 100k × 256-dim.
 */
object MicroBench {

  /** The round-1 planeBit, kept verbatim for comparison. */
  private def oldPlaneComponent(plane: Int, dim: org.apache.spark.sql.Column) =
    (pmod(Text.portableHash(concat(lit(s"pl$plane#"), dim.cast("string"))),
      lit(1000L)).cast("double") / 1000.0) - 0.5
  private def oldPlaneBit(v: org.apache.spark.sql.Column, plane: Int) = {
    val proj = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x.cast("double") * oldPlaneComponent(plane, i)),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1L)).otherwise(lit(0L))
  }
  private def oldBucket(v: org.apache.spark.sql.Column, planes: Int) =
    (0 until planes).map(p => oldPlaneBit(v, p) * lit(1L << p)).reduce(_ + _)

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("MB_ROWS", "100000").toLong
    val dims = sys.env.getOrElse("MB_DIMS", "256").toInt
    val planes = 8
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = spark.range(0, rows).select(col("id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => pmod(xxhash64(col("id"), d), lit(1000)).cast("float") / 1000.0f - 0.5f)
        .as("v")).cache()
    vecs.count() // materialize input outside the timed region

    def time(label: String, bucket: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      vecs.select(bucket.as("b")).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup + best-of-2 each
    val newSecs = (1 to 2).map(_ => time("new",
      Similarity.hyperplaneBucket(col("v"), planes, dims))).min
    val oldSecs = (1 to 2).map(_ => time("old", oldBucket(col("v"), planes))).min
    println(f"""{"metric":"hyperplane_bucket_speedup","rows":$rows,"dims":$dims,"planes":$planes,"old_sec":$oldSecs%.2f,"new_sec":$newSecs%.2f,"speedup":${oldSecs / newSecs}%.1f}""")
    spark.stop()
  }
}
