package graft

import org.apache.spark.sql.functions._
import graft.stats.{Drift, Sketches}
import graft.stats.Sketches.KllSketch

/**
 * KLL quantile sketch: accuracy, merge-equivalence (the VERDICT r2 "resume"
 * criterion — sketches from two partition subsets merged must yield the same
 * KS verdict as a single pass), serialization round-trip, Spark udaf path,
 * and the engine-ledger export.
 */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random stream (no RNG in tests either). */
  private def synth(n: Int, shift: Double = 0.0): IndexedSeq[Double] =
    (0 until n).map { i =>
      val h = (i * 2654435761L) & 0xffffffffL
      (h % 10000).toDouble / 100.0 + shift // ~U[0, 100) + shift
    }

  test("KLL quantiles within 2% rank error of exact") {
    val data = synth(20000)
    val s = new KllSketch(200)
    data.foreach(s.update)
    assert(s.count === 20000)
    val sorted = data.sorted
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = s.quantile(q)
      // rank of the estimate in the exact data
      val rank = sorted.count(_ <= est).toDouble / sorted.size
      assert(math.abs(rank - q) < 0.02, s"q=$q est=$est rank=$rank")
    }
    // CDF mass is exactly preserved (weights double on promotion)
    assert(s.weighted.map(_._2).sum === 20000L)
  }

  test("merge of split sketches == single pass (same KS verdict both ways)") {
    val all = synth(20000)
    val (h1, h2) = all.splitAt(9000)
    val merged = {
      val a = new KllSketch(200); h1.foreach(a.update)
      val b = new KllSketch(200); h2.foreach(b.update)
      a.merge(b)
    }
    val single = { val s = new KllSketch(200); all.foreach(s.update); s }
    assert(merged.count === single.count)
    // quantiles agree within the rank-error bound
    for (q <- Seq(0.25, 0.5, 0.75))
      assert(math.abs(merged.quantile(q) - single.quantile(q)) < 2.5,
        s"q=$q merged=${merged.quantile(q)} single=${single.quantile(q)}")
    // drift verdicts: identical distribution → quiet; +25 shift → loud,
    // and the merged sketch gives the SAME verdicts as the single-pass one
    val same = { val s = new KllSketch(200); synth(20000, 0.0).foreach(s.update); s }
    val far = { val s = new KllSketch(200); synth(20000, 25.0).foreach(s.update); s }
    for (base <- Seq(merged, single)) {
      assert(!Drift.checkSketches(base, same, "v").ksDrifted)
      val loud = Drift.checkSketches(base, far, "v")
      assert(loud.ksDrifted && loud.chi2Drifted)
    }
  }

  test("serialization round-trip preserves estimates and mergeability") {
    val s = new KllSketch(200)
    synth(5000).foreach(s.update)
    val back = KllSketch.fromBytes(s.toBytes)
    assert(back.count === s.count)
    assert(back.quantile(0.5) === s.quantile(0.5))
    assert(back.cdf(50.0) === s.cdf(50.0))
    val other = new KllSketch(200)
    synth(5000, 10.0).foreach(other.update)
    val m = KllSketch.mergeAll(Seq(s.toBytes, other.toBytes))
    assert(m.count === 10000)
  }

  test("Spark udaf path: one-pass sketch agg, null-safe, partition-invariant verdict") {
    val vals = synth(10000)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, if (i % 97 == 0) None else Some(v)) }
      .toDF("id", "v")
    val s = Drift.sketchColumn(df.repartition(8), "v")
    val nonNull = vals.zipWithIndex.filter(_._2 % 97 != 0).map(_._1)
    assert(s.count === nonNull.size) // nulls skipped, not counted as 0.0
    val sortedNN = nonNull.sorted
    val rank = sortedNN.count(_ <= s.quantile(0.5)).toDouble / sortedNN.size
    assert(math.abs(rank - 0.5) < 0.03)
    // Drift.check end-to-end: same data quiet, scaled data loud
    val cur = df.select($"id", ($"v" * 1.5 + 25.0).as("v"))
    assert(!Drift.check(df, df.repartition(4), "v").ksDrifted)
    assert(Drift.check(df, cur, "v").ksDrifted)
  }

  test("engine ledger exports per-partition sketches; merged drift is quiet across identical runs") {
    import graft.core.RuleSpec._
    import graft.rules.BoundRule
    import graft.engine.{EngineConfig, ValidationRun}
    val dir = java.nio.file.Files.createTempDirectory("graft-ledger-sk").toString
    val docs = graft.fixtures.Fixtures.docsPq(spark, 2000, 4)
    val assets = graft.fixtures.Fixtures.assets(spark)
    val rules = Seq(BoundRule(Required("doc_id")), BoundRule(SpansNonEmpty()))
    def runOnce(id: String): Unit =
      new ValidationRun(spark, EngineConfig(rules = rules,
        ledgerDir = Some(dir), runId = id,
        sketchExprs = Map("n_spans" -> size(col("spans")).cast("double"))))
        .runAndWrite(docs, Some(assets), s"$dir/out-$id")
    runOnce("runA"); runOnce("runB")
    val ledger = spark.read.parquet(s"$dir/ledger")
    val a = Drift.mergeLedgerSketches(ledger, "runA", "n_spans").get
    val b = Drift.mergeLedgerSketches(ledger, "runB", "n_spans").get
    assert(a.count === 2000 && b.count === 2000)
    val rep = Drift.checkSketches(a, b, "n_spans")
    assert(rep.ks === 0.0 && !rep.ksDrifted && !rep.chi2Drifted)
    // per-partition sketches merged == the span-count distribution: the
    // median doc has between 1 and 6 spans by fixture construction
    assert(a.quantile(0.5) >= 1.0 && a.quantile(0.5) <= 6.0)
  }

  // ---------------------------------------------- Misra–Gries heavy hitters

  /** Deterministic Zipf-ish stream: item i (1-based) appears ⌊600/i⌋ times
    * for i ≤ 60, plus 400 distinct singletons — 460 distinct values. */
  private def zipfStream: Seq[String] = {
    val heads = (1 to 60).flatMap(i => Seq.fill(600 / i)(f"item$i%03d"))
    val tail = (0 until 400).map(i => f"noise$i%03d")
    // interleave deterministically so evictions happen throughout the stream
    (heads ++ tail).zipWithIndex
      .sortBy { case (_, ix) => (ix * 2654435761L) & 0xffffffffL }
      .map(_._1)
  }

  test("MG exact regime: distinct <= capacity gives exact counts, zero error") {
    val s = new Sketches.MgSketch(64)
    val data = Seq.fill(50)("a") ++ Seq.fill(50)("b") ++ Seq.fill(7)("c") ++
      (0 until 30).map(i => s"one$i")
    data.foreach(s.update)
    assert(s.maxError === 0L && s.total === data.length)
    assert(s.estimate("a") === 50 && s.estimate("c") === 7 && s.estimate("one5") === 1)
    // deterministic (count desc, value asc) order, ties broken by value
    assert(s.topK(3).toSeq === Seq(("a", 50L), ("b", 50L), ("c", 7L)))
  }

  test("MG approximate regime: under-counts within the tracked bound, " +
       "true heavy hitters always present, error <= n/(capacity+1)") {
    val data = zipfStream
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val s = new Sketches.MgSketch(32)
    data.foreach(s.update)
    assert(s.maxError > 0, "stream must exercise the eviction path")
    assert(s.maxError <= data.size / 33, "classic MG bound n/(capacity+1)")
    truth.foreach { case (v, c) =>
      val est = s.estimate(v)
      assert(est <= c && c <= est + s.maxError, s"$v: est=$est true=$c err=${s.maxError}")
      if (c > s.maxError) assert(est > 0, s"guaranteed hitter $v (true $c) missing")
    }
  }

  test("MG merge tree keeps the PODS'12 bound and the exact-regime exactness") {
    val data = zipfStream
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // 8 chunk sketches merged pairwise — the shape Spark's partial agg takes
    val chunks = data.grouped(math.ceil(data.size / 8.0).toInt).toSeq.map { ch =>
      val s = new Sketches.MgSketch(32); ch.foreach(s.update); s
    }
    val merged = chunks.reduce(_ merge _)
    assert(merged.total === data.size)
    assert(merged.maxError <= data.size / 33, "merged error must keep n/(capacity+1)")
    truth.foreach { case (v, c) =>
      val est = merged.estimate(v)
      assert(est <= c && c <= est + merged.maxError)
      if (c > merged.maxError) assert(est > 0)
    }
    // exact regime survives merging: big-capacity chunks never level
    val exact = data.grouped(400).toSeq.map { ch =>
      val s = new Sketches.MgSketch(512); ch.foreach(s.update); s
    }.reduce(_ merge _)
    assert(exact.maxError === 0L)
    truth.foreach { case (v, c) => assert(exact.estimate(v) === c) }
  }

  test("MG serialization round-trip preserves counts, error, and mergeability") {
    val s = new Sketches.MgSketch(32)
    zipfStream.foreach(s.update)
    // a tracked value beyond writeUTF's 64 KB modified-UTF-8 limit must
    // survive (any expr casts to string here — one giant space-free token
    // would otherwise fail the whole run at finish())
    val giant = "x" * 70000 + "—ü"
    (0 until 700).foreach(_ => s.update(giant))
    val r = Sketches.MgSketch.fromBytes(s.toBytes)
    assert(r.total === s.total && r.maxError === s.maxError)
    assert(r.retired === s.retired)
    assert(r.topK(32).toSeq === s.topK(32).toSeq)
    assert(r.estimate(giant) === s.estimate(giant) && r.estimate(giant) > 0)
    val merged = Sketches.MgSketch.mergeAll(Seq(s.toBytes, s.toBytes))
    assert(merged.total === 2 * s.total)
    // version-1 payloads (writeUTF keys, no retired field) still decode: the
    // wire format was bumped to 2, not silently changed under the same byte
    val bo = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bo)
    o.writeByte(1); o.writeInt(32); o.writeLong(100L); o.writeLong(2L)
    o.writeInt(2); o.writeUTF("text"); o.writeLong(60L)
    o.writeUTF("ü-key"); o.writeLong(30L); o.flush()
    val v1 = Sketches.MgSketch.fromBytes(bo.toByteArray)
    assert(v1.total === 100L && v1.maxError === 2L)
    assert(v1.estimate("text") === 60L && v1.estimate("ü-key") === 30L)
    // reconstructed retired bound is conservative: at least the observed
    // untracked mass, never above total
    assert(v1.retired >= 100L - 90L && v1.retired <= 100L)
  }

  test("MG mass conservation: total == tracked + retired under any merge tree") {
    val data = zipfStream
    def conserve(s: Sketches.MgSketch): Unit =
      assert(s.total === s.trackedMass + s.retired,
        s"total=${s.total} tracked=${s.trackedMass} retired=${s.retired}")
    val onePass = new Sketches.MgSketch(8); data.foreach(onePass.update)
    conserve(onePass)
    val chunked = data.grouped(77).toSeq.map { ch =>
      val m = new Sketches.MgSketch(8); ch.foreach(m.update); conserve(m); m
    }.reduce(_ merge _)
    conserve(chunked)
    assert(chunked.retired !== onePass.retired,
      "fixture must produce merge-tree-dependent retirement")
    // exact regime retires nothing
    val exact = new Sketches.MgSketch(1024); data.foreach(exact.update)
    assert(exact.retired === 0L); conserve(exact)
  }

  test("MG Spark udaf path: partial-merged across partitions, exact regime " +
       "matches groupBy counts, null-safe") {
    val df = (zipfStream :+ null.asInstanceOf[String] :+ null.asInstanceOf[String])
      .toDF("v").repartition(7) // forces per-partition reduce + exchange merge
    val bytes = df.agg(Sketches.mgSketch(600)($"v").as("s"))
      .collect()(0).getAs[Array[Byte]](0)
    val s = Sketches.MgSketch.fromBytes(bytes)
    assert(s.total === zipfStream.size, "nulls must be skipped")
    assert(s.maxError === 0L)
    val truth = df.where($"v".isNotNull).groupBy($"v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (v, c) => assert(s.estimate(v) === c) }
    // Profiler facade: deterministic (cnt desc, value asc) rows + error col
    val hh = graft.stats.Profiler.heavyHitters(df, $"v", k = 3, capacity = 600)
      .collect()
    assert(hh.map(_.getString(0)).toSeq === Seq("item001", "item002", "item003"))
    assert(hh.head.getLong(1) === 600L && hh.head.getLong(2) === 0L)
    // plan shape: TWO-PHASE object hash aggregate — per-partition partial
    // summaries combine map-side, the exchange moves O(capacity) state per
    // partition, never the distinct domain (the reason this beats
    // groupBy+orderBy+limit at 100 TB)
    val plan = df.agg(Sketches.mgSketch(600)($"v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("(?i)partial_mgsketchaggregator".r.findFirstIn(plan).nonEmpty, plan)
  }
}
