package graft

import org.apache.spark.sql.functions._
import graft.sample.Sampling

/** Deterministic split + per-group quota (training-data curation ops). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 2000L).map(i => (i, s"src${i % 7}"))
    .toDF("doc_id", "source")

  test("hashSplit: deterministic, covers every row, fractions approximately honored") {
    val a = Sampling.hashSplit(docs, "doc_id")
    val b = Sampling.hashSplit(docs, "doc_id")
    assert(a.collect().toSet === b.collect().toSet) // reproducible
    val byodd = a.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byodd.values.sum === 2000L) // total rows preserved, every row assigned
    assert(byodd.keySet === Set("train", "val", "test"))
    // md5 buckets are uniform: 80/10/10 ± a few percent at n=2000
    assert(math.abs(byodd("train") - 1600.0) < 120, byodd.toString)
    assert(math.abs(byodd("val") - 200.0) < 80, byodd.toString)
    // split is keyed on the id alone: a subset of the corpus gets the SAME
    // assignments (no leakage across re-materializations)
    val sub = Sampling.hashSplit(docs.where($"doc_id" < 500), "doc_id")
    val full = a.where($"doc_id" < 500)
    assert(sub.collect().toSet === full.collect().toSet)
  }

  test("hashSplit rejects fractions that do not sum to 1") {
    val e = intercept[IllegalArgumentException](
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)))
    assert(e.getMessage.contains("sum to 1"))
  }

  test("hashSplit plan is a pure projection over the scan (no shuffle)") {
    val plan = Sampling.hashSplit(docs, "doc_id").queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("quotaIds: n smallest distinct ids per group, matches window semantics") {
    // duplicates + nulls: quota dedups ids and skips null ids
    val messy = docs.union(docs.limit(100))
      .union(Seq((null.asInstanceOf[java.lang.Long], "src0"))
        .toDF("doc_id", "source").select($"doc_id".cast("long"), $"source"))
    val got = Sampling.quotaIds(messy, "source", "doc_id", 5)
      .as[(String, Long)].collect().toSet
    val want = (0L until 2000L).map(i => (s"src${i % 7}", i))
      .groupBy(_._1).values.flatMap(xs => xs.sortBy(_._2).take(5)).toSet
    assert(got === want)
    assert(got.size === 7 * 5)
  }

  test("quotaIds plan partial-aggregates (map-side combine before the shuffle)") {
    val qe = Sampling.quotaIds(docs, "source", "doc_id", 5)
      .queryExecution.executedPlan.toString
    // two-phase hash aggregate around one exchange: bounded O(groups×n)
    // shuffle, the 100 TB shape (vs a window's unsplittable group partition)
    assert(qe.contains("partial_cappedminlongcollect") ||
           qe.toLowerCase.contains("partial"), qe)
    assert(!qe.contains("Window"), qe)
  }

  test("quotaSample returns full rows of kept ids (incl. null-group safety)") {
    val withNullGroup = docs
      .withColumn("source", when($"doc_id" < 10, lit(null)).otherwise($"source"))
    val kept = Sampling.quotaSample(withNullGroup, "source", "doc_id", 3)
    val got = kept.select($"source", $"doc_id").as[(String, Long)].collect()
    assert(got.length === 8 * 3) // 7 sources + the null group
    assert(got.count(_._1 == null) === 3) // null group capped too
    assert(kept.columns.toSeq === withNullGroup.columns.toSeq) // original shape
  }
}
