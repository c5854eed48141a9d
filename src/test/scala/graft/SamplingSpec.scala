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

  test("stratifiedHashSample: deterministic, per-group fractions honored, nulls excluded") {
    val langs = Seq("en", "zh", "es")
    val d = (0L until 3000L).map(i => (i, langs((i % 3).toInt)))
      .toDF("doc_id", "lang")
      // null id and null group rows exercise the exclusion rules
      .union(Seq((null.asInstanceOf[java.lang.Long], "en"))
        .toDF("doc_id", "lang").select($"doc_id".cast("long"), $"lang"))
      .union(Seq((9999L, null.asInstanceOf[String])).toDF("doc_id", "lang"))
    val fr = Map("en" -> 0.5, "zh" -> 1.0, "es" -> 0.0)
    val a = Sampling.stratifiedHashSample(d, "doc_id", "lang", fr)
    val b = Sampling.stratifiedHashSample(d, "doc_id", "lang", fr)
    assert(a.collect().toSet === b.collect().toSet) // reproducible
    val by = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(by.getOrElse("zh", 0L) === 1000L)           // fraction 1.0 keeps all
    assert(!by.contains("es"))                          // fraction 0.0 keeps none
    assert(math.abs(by("en") - 500.0) < 90, by.toString) // 0.5 in expectation
    assert(!by.contains(null))                          // null group → default 0
    assert(a.where($"doc_id".isNull).count() === 0)     // null id never kept
    // keep decision keyed on the id alone: subset gets the SAME sample
    val sub = Sampling.stratifiedHashSample(
      d.where($"doc_id" < 500), "doc_id", "lang", fr).collect().toSet
    assert(sub === a.where($"doc_id" < 500).collect().toSet)
  }

  test("stratified sample is decorrelated from the hash split (salted hash)") {
    val d = (0L until 2000L).map(i => (i, "en")).toDF("doc_id", "lang")
    val kept = Sampling.stratifiedHashSample(d, "doc_id", "lang", Map("en" -> 0.5))
    val mix = Sampling.hashSplit(kept, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // without the salt, keeping 50% would carve out exactly the train
    // buckets; with it the sample's split mix stays ~80/10/10
    val tot = mix.values.sum.toDouble
    assert(math.abs(mix("train") / tot - 0.8) < 0.06, mix.toString)
    assert(mix.keySet === Set("train", "val", "test"))
    // and a different salt keeps a genuinely different subset
    val other = Sampling.stratifiedHashSample(d, "doc_id", "lang",
      Map("en" -> 0.5), salt = "other").select("doc_id").as[Long].collect().toSet
    val base = kept.select("doc_id").as[Long].collect().toSet
    assert((base -- other).nonEmpty && (other -- base).nonEmpty)
  }

  test("stratifiedHashSample plan is a pure projection filter (no shuffle)") {
    val plan = Sampling.stratifiedHashSample(docs, "doc_id", "source",
      Map("src0" -> 0.5)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("mixtureFractions: weight ratios realized exactly; bottleneck scales the total") {
    val counts = Map("web" -> 8000L, "books" -> 1000L, "code" -> 4000L)
    // feasible: 2000 docs at 50/25/25 → web 1000 (f=.125), books 500 (f=.5),
    // code 500 (f=.125)
    val fr = Sampling.mixtureFractions(counts,
      Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25), 2000L)
    assert(math.abs(fr("web") - 0.125) < 1e-12)
    assert(math.abs(fr("books") - 0.5) < 1e-12)
    assert(math.abs(fr("code") - 0.125) < 1e-12)
    // infeasible: 8000 docs would need books 2000 > 1000 available → total
    // scales to the bottleneck (books/0.25 = 4000) and RATIOS are preserved
    val clamped = Sampling.mixtureFractions(counts,
      Map("web" -> 0.5, "books" -> 0.25, "code" -> 0.25), 8000L)
    assert(math.abs(clamped("books") - 1.0) < 1e-12, clamped.toString)
    val expWeb = 0.5 * 4000 / 8000; val expCode = 0.25 * 4000 / 4000
    assert(math.abs(clamped("web") - expWeb) < 1e-12)
    assert(math.abs(clamped("code") - expCode) < 1e-12)
    // zero-weight groups are absent (mixtureSample gives them fraction 0)
    val noW = Sampling.mixtureFractions(counts,
      Map("web" -> 1.0, "books" -> 0.0), 100L)
    assert(noW.keySet === Set("web"))
    // weight on an empty group is an error, not a silent skew
    intercept[IllegalArgumentException](Sampling.mixtureFractions(
      counts, Map("absent" -> 1.0), 10L))
  }

  test("mixtureSample: end-to-end mix approximates the target weights") {
    val d = ((0L until 4000L).map(i => (i, "web")) ++
             (4000L until 5000L).map(i => (i, "books")))
      .toDF("doc_id", "source")
    val got = Sampling.mixtureSample(d, "doc_id", "source",
      Map("web" -> 0.5, "books" -> 0.5), targetTotal = 1000L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // 500/500 expected; md5 buckets are uniform so ±~20% at n=500
    assert(math.abs(got("web") - 500.0) < 100, got.toString)
    assert(math.abs(got("books") - 500.0) < 100, got.toString)
  }

  test("mixtureSample accepts a non-string (integer) group column") {
    // ADVICE r5: the group-count collect assumed StringType and threw
    // ClassCastException for int/long group columns
    val d = ((0L until 4000L).map(i => (i, 1)) ++
             (4000L until 5000L).map(i => (i, 2)))
      .toDF("doc_id", "source_id")
    val got = Sampling.mixtureSample(d, "doc_id", "source_id",
      Map("1" -> 0.5, "2" -> 0.5), targetTotal = 1000L)
      .groupBy("source_id").count().as[(Int, Long)].collect().toMap
    assert(math.abs(got(1) - 500.0) < 100, got.toString)
    assert(math.abs(got(2) - 500.0) < 100, got.toString)
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
