package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.rules.{BoundRule, ValidationEngine}

/**
 * Scale-path checks that don't compile to a per-row projection.
 */
object UniquenessCheck {
  /**
   * Global uniqueness of `key` via a salted two-level hash-aggregate
   * (SURVEY §7.3 step 5; north rule "uniqueness via salted repartition +
   * hash-aggregate on doc_id").
   *
   * Level 1 groups on `(pmod(hash(key), salts), key)` so a hot key (skewed
   * prefix) is *not* a problem for the partial aggregation: Spark's
   * hash-aggregate does map-side partial combine, and AQE splits any skewed
   * shuffle partition. Level 2 re-aggregates per key. Returns
   * `(key, dup_count)` for keys seen more than once. Null/blank keys are NOT
   * uniqueness violations (they violate Required instead) — matching pandas
   * `duplicated(subset=[k], keep=False)` flagging only genuine value groups
   * is handled by the caller keeping nulls if desired.
   */
  def duplicateKeys(df: DataFrame, key: String, salts: Int = 64): DataFrame =
    df.select(col(key))
      .where(col(key).isNotNull)
      .groupBy(pmod(xxhash64(col(key)), lit(salts)).as("__salt"), col(key))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(key))
      .agg(sum("__cnt").as("dup_count"))
      .where(col("dup_count") > 1)

  /** Violation rows for duplicated keys: left-semi join of the docs table
    * against the duplicate-key set. The set scales with the duplication RATE
    * (≈1 M keys at 40 M docs on the bench fixture), so it is hash-joined on
    * the shuffled key — a forced broadcast would collect it to the driver
    * and build the hash relation single-threaded. */
  def violations(df: DataFrame, key: String, partCol: String,
                 ruleId: String = "unique(doc_id)"): DataFrame = {
    val dups = duplicateKeys(df, key)
    df.join(dups.select(col(key)).hint("shuffle_hash"), Seq(key), "left_semi")
      .select(lit(ruleId).as("rule_id"), col(key).cast("string").as("doc_id"),
              col(partCol).cast("int").as("part"),
              lit(null).cast("int").as("span_offset"),
              lit(s"duplicate $key").as("detail"))
  }
}

object ReferentialIntegrity {
  /**
   * media_ref → asset catalog check (SURVEY J4, north rule). Explodes media
   * spans only (text spans never join), left-anti joins the catalog.
   * Catalyst/AQE picks broadcast vs sort-merge from the catalog size; pass
   * `broadcastCatalog=true` to force the hint when the caller knows it's small.
   */
  def violations(docs: DataFrame, assets: DataFrame,
                 broadcastCatalog: Boolean = false): DataFrame = {
    val refs = docs.select(
        col("doc_id"), col("part"),
        explode(filter(col("spans"), s => s.getField("media_ref").isNotNull)).as("s"))
      .select(col("doc_id"), col("part"),
              col("s.media_ref").as("media_ref"),
              col("s.offset").as("span_offset"))
    violationsFromRefs(refs, assets, broadcastCatalog)
  }

  /** The anti-join half of [[violations]], for a caller that already holds
    * the exploded `(doc_id, part, media_ref, span_offset)` reference rows —
    * the engine extracts them on the rule-pass scan so RI costs no second
    * decode of the spans column. */
  def violationsFromRefs(refs: DataFrame, assets: DataFrame,
                         broadcastCatalog: Boolean = false): DataFrame = {
    val cat = if (broadcastCatalog) broadcast(assets) else assets
    refs.join(cat, refs("media_ref") === cat("asset_id"), "left_anti")
      .select(lit("referential_integrity(media_ref)").as("rule_id"),
              col("doc_id").cast("string").as("doc_id"), col("part"),
              col("span_offset").cast("int").as("span_offset"),
              concat(lit("dangling media_ref "), col("media_ref")).as("detail"))
  }
}

/** Driver-side attempt clock for ledger rows: wall-clock millis, bumped to
  * strictly increase within one JVM so two attempts landing in the same
  * millisecond (fast tests, quick retries) still order deterministically.
  * Across JVMs the wall clock alone is NOT trusted (NTP can step it
  * backward between attempts): `runAndWrite` additionally floors each
  * attempt's ts at 1 + the max attempt_ts already in the run's ledger, so
  * the newest attempt always wins the readers' latest-attempt reduction. */
private[engine] object AttemptClock {
  private val last = new java.util.concurrent.atomic.AtomicLong(0L)
  def next(): Long =
    last.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))
}

/** Engine configuration. `runTs` pins "now" for deterministic future-date
  * rules (reference non-determinism noted in SURVEY §7.4). */
case class EngineConfig(
    rules: Seq[BoundRule],
    checkReferentialIntegrity: Boolean = true,
    uniquenessKey: Option[String] = Some("doc_id"),
    ledgerDir: Option[String] = None,
    runId: String = "run-0",
    /** Persist the narrow per-row annotation (id, part, rule masks) so the
      * verdict aggregation reuses the rule pass instead of re-scanning the
      * docs table (~40 B/row, MEMORY_AND_DISK). At extreme scale where even
      * the narrow frame shouldn't be spilled (10^12 rows ≈ tens of TB), set
      * false to trade one extra narrow column-pruned scan for zero cache. */
    persistAnnotations: Boolean = true,
    /** Numeric expressions sketched per partition into the ledger as KLL
      * quantile sketches (name → column expr over the docs table), feeding
      * cross-run drift checks from merged sketches. */
    sketchExprs: Map[String, org.apache.spark.sql.Column] = Map.empty,
    /** Expressions whose DISTINCT COUNT is sketched per partition into the
      * ledger as HyperLogLog registers (name → column expr), mergeable
      * cross-partition/cross-run by [[graft.stats.Drift.mergeLedgerHll]]
      * (SURVEY §2.11 "HLL sketch persisted per partition and merged later").
      * A null value contributes one distinct value (xxhash64 seed), matching
      * the q26 convention; pre-filter the expr to exclude nulls. */
    hllSketchExprs: Map[String, org.apache.spark.sql.Column] = Map.empty,
    /** String expressions whose VALUE DISTRIBUTION is summarized per
      * partition into the ledger as Misra–Gries heavy-hitter summaries
      * (name → column expr), mergeable cross-partition/cross-run by
      * [[graft.stats.Drift.mergeLedgerMg]] — the categorical face of the
      * ledger drift triad (KLL numeric / HLL cardinality / MG top-value
      * mix), verdicts via
      * [[graft.stats.Drift.ledgerCategoricalDrift]]. NULLs are skipped. */
    mgSketchExprs: Map[String, org.apache.spark.sql.Column] = Map.empty,
    /** Aliased per-row expressions appended to the narrow rule-pass
      * projection and exposed via `ValidationRun.lastNarrow` — lets a caller
      * compute CONTENT outputs (dedup signatures, token stats, quality
      * features) on the SAME scan that evaluates the validation rules,
      * instead of re-reading the wide docs table for a second pass. At
      * 100 TB the second decode of the spans column is the single largest
      * avoidable cost of a validate-then-fingerprint pipeline. */
    passthroughExprs: Seq[org.apache.spark.sql.Column] = Nil)

/**
 * Per-partition validation orchestrator (SURVEY §3 EP1/EP2 Spark shape).
 *
 * Evaluates the full rule suite over the docs table, producing the north
 * rule's artifacts: per-partition pass/fail verdicts and violation rows
 * `(rule_id, doc_id, part, span_offset, detail)`. Partition pruning comes for
 * free from `filter($"part" === p)` over a parquet table partitioned by
 * `part`. A checkpoint ledger (one parquet row per completed partition) makes
 * runs resumable: partitions present in the ledger are skipped, and verdicts
 * are recomputed only for the remainder.
 *
 * NOTE on granularity: per-partition *verdicts* are an output contract, not an
 * execution constraint — the row-level rule pass is one whole-table projection
 * + one groupBy(part) aggregate (2 Spark jobs total), NOT a driver loop over
 * partitions. Only resume bookkeeping is per-partition.
 */
class ValidationRun(spark: SparkSession, config: EngineConfig) {
  import spark.implicits._

  private def ledgerPath(run: String) = config.ledgerDir.map(d => s"$d/ledger")

  /** Deterministic fingerprint of the configured rule set (FULL specs +
    * reasons, order-independent). Written to every ledger row; resume TRUSTS
    * a completed partition only if it was validated under the SAME rules —
    * otherwise a rule-set edit between attempts would silently mix verdicts
    * from two different suites in one output.
    *
    * Hashes the whole RuleSpec (case-class toString carries every
    * constructor parameter), not just `ruleId`: many rule ids omit their
    * parameters (Formula's SQL, Pattern's regex under an unchanged name,
    * range bounds, AllowedValues list), so a parameter-only edit between
    * attempts must still flip the fingerprint (ADVICE r4). NoFutureDate's
    * timestamp is canonicalized to epoch millis — `Timestamp.toString`
    * renders in the JVM default zone, which would make the hash depend on
    * the resuming JVM's timezone rather than the rule's value. */
  private def canonSpec(s: RuleSpec): String = s match {
    case RuleSpec.NoFutureDate(c, ts) => s"NoFutureDate($c,${ts.getTime})"
    case other => other.toString
  }
  private[graft] def rulesHash: String = {
    val canon = config.rules.map(r => s"${canonSpec(r.spec)}|${r.reason}").sorted
      .mkString(";") + s"|uniq=${config.uniquenessKey}|ri=${config.checkReferentialIntegrity}"
    java.lang.Long.toHexString(
      graft.functions.Hashing.md5_60(canon.getBytes("UTF-8")))
  }

  /** Partitions already completed in a previous attempt of this run.
    * `mergeSchema` so a ledger dir whose older rows predate the always-on
    * sketch columns (pre-r4 schema) still reads cleanly.
    *
    * A partition can carry SEVERAL ledger rows (one per attempt that
    * re-validated it, e.g. after a rule edit forced re-validation); only the
    * LATEST attempt's row describes the artifacts currently on disk, so the
    * set reduces to the newest row per partition by `attempt_ts` before the
    * hash check (ADVICE r4: trusting a stale matching-hash row after the
    * artifacts were rewritten under a different suite). Rows with a
    * `rules_hash` different from the current config are NOT treated as
    * complete; legacy rows without either column are trusted (ts = 0). */
  def completedPartitions(): Set[Int] = ledgerPath(config.runId) match {
    case Some(p) =>
      try {
        val df0 = spark.read.option("mergeSchema", "true").parquet(p)
          .where($"run_id" === config.runId)
        val df1 = if (df0.columns.contains("attempt_ts")) df0
                  else df0.withColumn("attempt_ts", lit(0L))
        val df = if (df1.columns.contains("rules_hash")) df1
                 else df1.withColumn("rules_hash", lit(null).cast("string"))
        // legacy null hashes ride through max_by behind a sentinel (null
        // VALUE handling in max_by is an implementation detail not worth
        // depending on)
        val legacy = " legacy"
        df.groupBy($"part")
          .agg(max_by(coalesce($"rules_hash", lit(legacy)),
                      coalesce($"attempt_ts", lit(0L))).as("rules_hash"))
          .where($"rules_hash" === legacy || $"rules_hash" === rulesHash)
          .select("part").as[Int].collect().toSet
      }
      catch { case _: Throwable => Set.empty }
    case None => Set.empty
  }

  /** Run the full suite over `docs` (optionally minus completed partitions).
    * Returns (verdicts, violations); both lazy until written/collected.
    *
    * Uniqueness is a GLOBAL rule: duplicate keys are detected over the whole
    * input even when only a subset of partitions is being (re)processed —
    * violations are then emitted only for in-scope partitions. This keeps
    * resume semantics correct: a key duplicated across a completed and a
    * pending partition is still flagged in the pending one.
    *
    * `limitParts` restricts processing to the given partitions (used by tests
    * to simulate a mid-run kill, and usable for targeted re-validation). */
  def run(docs: DataFrame, assets: Option[DataFrame] = None,
          resume: Boolean = false,
          limitParts: Option[Seq[Int]] = None): (DataFrame, DataFrame) = {
    val done = if (resume) completedPartitions() else Set.empty[Int]
    def partFilter(c: org.apache.spark.sql.Column) = {
      val base = if (done.isEmpty) lit(true) else !c.isin(done.toSeq: _*)
      limitParts.map(ps => base && c.isin(ps: _*)).getOrElse(base)
    }
    val todo = docs.where(partFilter($"part"))

    // Row-level + span-level rules: ONE projection pass over the docs table,
    // reduced to the narrow (doc_id, part, masks) shape and persisted so the
    // violation artifact AND the verdict aggregation both derive from it —
    // run() touches the docs table exactly 3 times total (rule pass,
    // uniqueness key scan, RI media-span scan), guarded by GoldenEngineSpec.
    val rowRules = config.rules.filterNot(r =>
      r.spec.isInstanceOf[RuleSpec.Unique]) // Unique handled by salted agg below
    // Referential-integrity refs ride the rule-pass scan too (r6): the RI
    // check only needs each doc's (media_ref, offset) pairs, and the rule
    // pass already decodes the spans column — extracting them there saves
    // the dedicated full spans re-decode the r5 shape paid. Gated like the
    // uniqueness sourcing below: full runs with a thin cache only (content
    // passthroughs widen every cached row; see the measured negative result
    // on the uniqueness gate). The refs array adds ~tens of bytes/row for
    // the ~1-in-3 docs carrying media spans.
    val riViaNarrow = assets.isDefined && config.checkReferentialIntegrity &&
      done.isEmpty && limitParts.isEmpty && config.passthroughExprs.isEmpty &&
      docs.columns.contains("spans")
    val riRefsCol: Seq[org.apache.spark.sql.Column] =
      if (riViaNarrow)
        Seq(transform(filter(col("spans"), s => s.getField("media_ref").isNotNull),
          s => struct(s.getField("media_ref").as("media_ref"),
                      s.getField("offset").as("offset"))).as("__media_refs"))
      else Nil
    // Ledger-sketch inputs ride the SAME scan as the rule pass (one double /
    // one 8-byte hash per sketch per row in the narrow cache) — the --sketch
    // flag costs zero extra scans of the docs table.
    val narrow = ValidationEngine.annotateNarrow(todo, rowRules, "doc_id", "part",
      sketchPassthroughCols ++ config.passthroughExprs ++ riRefsCol)
    val narrowP =
      if (config.persistAnnotations)
        narrow.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else narrow
    lastNarrow = if (config.persistAnnotations) Some(narrowP) else None
    val rowViolations = ValidationEngine.violationsFromNarrow(narrowP, rowRules)

    // Scale-path checks producing extra violation rows.
    //
    // Uniqueness sourcing (r6): the r5 shape re-scanned the WIDE docs table
    // twice more for uniqueness — once for the key scan feeding the salted
    // dup-count agg and once as the probe side of the violation semi-join
    // (stage-profiled at 8→32: together the worst-scaling stages of the
    // engine leg). On a FULL run over the narrow id column, both passes are
    // derivable from the narrow annotation instead — a 2-column pruned read
    // of the already-persisted cache, zero extra decodes of the spans
    // column. Falls back to the docs table when (a) resuming / limiting
    // partitions (uniqueness is GLOBAL but narrow only covers in-scope
    // partitions), (b) the key isn't the narrow id column, (c) the key
    // column isn't already a string (narrow stores the CAST string; for
    // string keys the cast is the identity, so grouping is unchanged), or
    // (d) content passthroughs widen the cache: a MEMORY_AND_DISK cache
    // whose partitions spill stores whole serialized batches, so a
    // "2-column" read of a WIDE cache pays full-width I/O (measured: the
    // content-carrying ScalingBench leg read 51.5 GB vs 22.1 GB and LOST
    // wall at 32-wide, while the content-free headline leg dropped from
    // ~630 to ~424 CPU-s). Thin cache -> use it; wide cache -> the pruned
    // parquet re-scan stays the cheaper source.
    val uniqSource: DataFrame = {
      val keyIsNarrowId = config.uniquenessKey.contains("doc_id") &&
        docs.schema.fields.exists(f => f.name == "doc_id" &&
          f.dataType == org.apache.spark.sql.types.StringType)
      // A dedicated thin (doc_id, part) cache for the content-passthrough
      // case was ALSO tried this round (share one pruned scan between the
      // two uniqueness passes) and reverted: the cache build's columnar
      // compression cost ≈ the pruned parquet re-scan it saves, so the
      // cleanest measured legs showed no win — the plain pruned scans stay.
      if (keyIsNarrowId && done.isEmpty && limitParts.isEmpty &&
          config.passthroughExprs.isEmpty)
        narrowP.select($"doc_id", $"part")
      else docs
    }
    val extra = Seq(
      config.uniquenessKey.map(k =>
        UniquenessCheck.violations(uniqSource, k, "part").where(partFilter(col("part")))),
      assets.filter(_ => config.checkReferentialIntegrity).map { a =>
        if (riViaNarrow)
          ReferentialIntegrity.violationsFromRefs(
            narrowP.select($"doc_id", $"part",
                explode($"__media_refs").as("s"))
              .select($"doc_id", $"part", $"s.media_ref".as("media_ref"),
                      $"s.offset".as("span_offset")), a)
        else ReferentialIntegrity.violations(todo, a)
      }
    ).flatten
    // Violations are tiny relative to the input; cache so the verdict
    // aggregation and the artifact write evaluate the scan+rules once, not
    // twice. (Unpersisted by runAndWrite; harmless to leave for ad-hoc use.)
    val allViolations = (rowViolations +: extra).reduce(_.unionByName(_)).cache()

    // Per-partition verdicts: rows whose (doc_id, part) has ANY violation are
    // failed. Row-accurate even for null/duplicated ids: a null-coalesced key
    // joined against the (small) distinct violating-key set, then ONE
    // aggregate producing totals and failure counts together (r2 ran a
    // separate totals scan plus a semi-join re-scan of the docs table here).
    val nullKey = "\u0000<null>"
    val badKeys = allViolations
      .select(coalesce($"doc_id", lit(nullKey)).as("__k"), $"part").distinct()
      .withColumn("__hit", lit(true))
    val verdicts = narrowP
      .select(coalesce($"doc_id", lit(nullKey)).as("__k"), $"part")
      // The violating-key set scales with the violation RATE (millions of
      // rows at 40 M docs / 8% dirt), so its size is unbounded — never let
      // the planner broadcast it. Round 1 left this to AQE "sized
      // generously"; profiling showed the estimate hovering around the
      // threshold, and legs where AQE picked broadcast built a multi-million
      // row hash relation single-threaded (10× wall, 45× GC — the bimodal
      // bench episodes). SHUFFLE_HASH pins the scale-correct plan: hash-join
      // on the shuffled key, no sort, no driver-side relation.
      .join(badKeys.hint("shuffle_hash"), Seq("__k", "part"), "left")
      .groupBy("part")
      .agg(count(lit(1)).as("total_rows"),
           sum(coalesce($"__hit", lit(false)).cast("long")).as("failed_docs"))
      .select($"part",
        $"total_rows",
        ($"total_rows" - $"failed_docs").as("passed"),
        $"failed_docs".as("failed"),
        when($"failed_docs" > 0, lit("FAIL")).otherwise(lit("PASS")).as("status"),
        lit(config.rules.size + 2).as("rules_evaluated"))
    (verdicts, allViolations)
  }

  /** The narrow annotation frame persisted by the last [[run]] (exposed for
    * plan-shape tests); released by [[unpersistAll]]. */
  private[graft] var lastNarrow: Option[DataFrame] = None


  /** Per-row sketch inputs appended to the narrow annotation so ledger
    * sketches share the rule-pass scan: one double per KLL expr, one
    * xxhash64 long per HLL expr. Names are sorted for a deterministic
    * column order. */
  private def sketchPassthroughCols: Seq[org.apache.spark.sql.Column] =
    config.sketchExprs.toSeq.sortBy(_._1).map { case (n, c) =>
      c.cast("double").as(s"__skv_$n") } ++
    config.hllSketchExprs.toSeq.sortBy(_._1).map { case (n, c) =>
      xxhash64(c).as(s"__hll_$n") } ++
    config.mgSketchExprs.toSeq.sortBy(_._1).map { case (n, c) =>
      c.cast("string").as(s"__mgv_$n") }

  /** Per-partition ledger sketch frame `(part, sketches, hll_sketches, mg_sketches)`, or
    * None when no sketch exprs are configured. Aggregates over the persisted
    * narrow annotation when available (zero extra docs scans — plan-shape
    * guarded); falls back to one column-pruned scan of the in-scope
    * partitions when `persistAnnotations = false`. */
  private[graft] def ledgerSketchFrame(
      docs: DataFrame, inScopeParts: () => Seq[Int]): Option[DataFrame] = {
    if (config.sketchExprs.isEmpty && config.hllSketchExprs.isEmpty &&
        config.mgSketchExprs.isEmpty) return None
    val kNames = config.sketchExprs.keys.toSeq.sorted
    val hNames = config.hllSketchExprs.keys.toSeq.sorted
    val mNames = config.mgSketchExprs.keys.toSeq.sorted
    val base = lastNarrow.getOrElse {
      docs.where($"part".isin(inScopeParts(): _*))
        .select($"part".cast("int").as("part") +: sketchPassthroughCols: _*)
    }
    val kll = graft.stats.Sketches.kllSketch()
    val hll = graft.stats.Sketches.hllSketch()
    val mg = graft.stats.Sketches.mgSketch()
    val aggs = kNames.map(n => kll(col(s"__skv_$n")).as(s"__sk_$n")) ++
               hNames.map(n => hll(col(s"__hll_$n")).as(s"__hsk_$n")) ++
               mNames.map(n => mg(col(s"__mgv_$n")).as(s"__msk_$n"))
    val grouped = base.groupBy($"part").agg(aggs.head, aggs.tail: _*)
    val nullMap = lit(null).cast(
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.BinaryType))
    val kMap = if (kNames.isEmpty) nullMap
      else map(kNames.flatMap(n => Seq(lit(n), col(s"__sk_$n"))): _*)
    val hMap = if (hNames.isEmpty) nullMap
      else map(hNames.flatMap(n => Seq(lit(n), col(s"__hsk_$n"))): _*)
    val mMap = if (mNames.isEmpty) nullMap
      else map(mNames.flatMap(n => Seq(lit(n), col(s"__msk_$n"))): _*)
    Some(grouped.select($"part", kMap.as("sketches"), hMap.as("hll_sketches"),
      mMap.as("mg_sketches")))
  }

  /** Release every frame persisted by the last [[run]] (callers additionally
    * unpersist the violations frame they received). */
  def unpersistAll(): Unit = {
    lastNarrow.foreach(_.unpersist())
    lastNarrow = None
  }

  /** Execute + persist artifacts + ledger; resumable entry point.
    *
    * Crash-safety: artifact writes are per-partition IDEMPOTENT — both
    * outputs are partitioned by `part` and written with dynamic partition
    * overwrite, so a re-run after a crash between the artifact write and the
    * ledger append REPLACES the affected partitions instead of appending
    * duplicates (the round-1 Append mode double-wrote them). The ledger row
    * is still appended last: a partition is "complete" only once its
    * artifacts are durably committed. */
  def runAndWrite(docs: DataFrame, assets: Option[DataFrame],
                  outDir: String, resume: Boolean = false,
                  limitParts: Option[Seq[Int]] = None): Unit = {
    val t0 = System.nanoTime()
    val (verdicts, viols) = run(docs, assets, resume, limitParts)
    // fresh runs truncate everything (static overwrite); resumed/partial runs
    // replace only the partitions present in this attempt's output
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode",
      if (resume || limitParts.nonEmpty) "dynamic" else "static")
    val mode = SaveMode.Overwrite
    try {
      viols.write.mode(mode).partitionBy("part").parquet(s"$outDir/violations")
      verdicts.cache()
      verdicts.write.mode(mode).partitionBy("part").parquet(s"$outDir/verdicts")
    } finally prevMode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    ledgerPath(config.runId).foreach { lp =>
      val wallMs = (System.nanoTime() - t0) / 1000000
      // Attempt ordering must survive a wall clock stepping BACKWARD between
      // JVMs (NTP correction, VM clock skew): floor this attempt's ts at
      // 1 + the max attempt_ts already recorded for this run, so the newest
      // attempt always wins the readers' max_by reduction even if the wall
      // clock says otherwise. One read of the (tiny) ledger, resume-only in
      // effect — a fresh run's ledger dir is empty.
      // Only a MISSING/empty ledger (every fresh run) legitimately yields 0;
      // a genuine read failure must propagate — silently flooring at 0 would
      // disable the skew guard and let a stale attempt win again.
      val prevMaxTs: Long = try {
        spark.read.option("mergeSchema", "true").parquet(lp)
          .where($"run_id" === config.runId)
          .agg(max(coalesce(col("attempt_ts"), lit(0L)))).as[Option[Long]]
          .head().getOrElse(0L)
      } catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      val attemptTs = math.max(AttemptClock.next(), prevMaxTs + 1)
      // real per-partition violation counts (r2 stubbed this as -1): the
      // violations frame is cached, so this group-count costs no re-scan
      val violsPerPart = viols.groupBy($"part".cast("int").as("part"))
        .agg(count(lit(1)).as("__viol_n"))
      val ledger = verdicts.join(violsPerPart, Seq("part"), "left").select(
        lit(config.runId).as("run_id"), $"part", $"status",
        $"total_rows", $"failed".as("failed_rows"),
        coalesce($"__viol_n", lit(0L)).as("violations"), lit(wallMs).as("wall_ms"),
        lit(rulesHash).as("rules_hash"),
        // attempt ordering: re-validated partitions append a SECOND row for
        // the same (run_id, part); readers reduce to the latest attempt
        // (completedPartitions, Drift.mergeLedgerSketches/Hll) so stale
        // rows never double-weight sketches or resurrect old verdict trust
        lit(attemptTs).as("attempt_ts"))
      // Optional per-partition sketches (north rule "drift over quantile
      // sketches" + SURVEY §2.11 persisted HLL): KLL quantile sketches and
      // HLL distinct-count registers, aggregated from the PERSISTED narrow
      // annotation (the sketch inputs rode the rule-pass scan) — zero extra
      // scans of the docs table; merged across partitions/runs by
      // Drift.mergeLedgerSketches / Drift.mergeLedgerHll without re-scanning.
      // All THREE map columns (KLL / HLL / MG) are ALWAYS present (null when
      // unconfigured) so the ledger parquet schema is stable across runs
      // with/without --sketch
      // (ADVICE r3: a mixed-schema ledger dir breaks plain spark.read).
      val nullMap = lit(null).cast(
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.BinaryType))
      val withSketches = ledgerSketchFrame(docs,
          () => verdicts.select($"part").as[Int].collect().toSeq) match {
        case Some(sk) => ledger.join(sk, Seq("part"), "left")
        case None => ledger.withColumn("sketches", nullMap)
                           .withColumn("hll_sketches", nullMap)
                           .withColumn("mg_sketches", nullMap)
      }
      withSketches.write.mode(SaveMode.Append).parquet(lp)
    }
    verdicts.unpersist()
    viols.unpersist()
    unpersistAll()
  }
}
