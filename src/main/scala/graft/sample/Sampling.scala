package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.Text

/**
 * Deterministic sampling / splitting for training-data curation — the two
 * assignment operators every corpus pipeline needs downstream of validation
 * and dedup (beyond the reference's surface, which samples only for type
 * detection — `/root/reference/src/semantic_pipeline/detector.py:47`):
 *
 *  - hash split: stable train/val/test assignment keyed on the document id,
 *    reproducible across runs, engines and table layouts (the md5-derived
 *    portable hash is engine-portable by construction, so the SAME document
 *    lands in the SAME split here, in the DuckDB oracle, or in any other
 *    system that re-implements the formula). A random split is NOT
 *    reproducible under retries/backfills and leaks documents across splits
 *    when the corpus is re-materialized.
 *  - per-group quota: cap each group (source, domain, language) at n
 *    documents, keeping the n smallest ids — deterministic source mixing.
 *
 * Scale design: the split is a pure per-row projection (no shuffle at all);
 * the quota is ONE hash aggregate with bounded per-group state (n ids), so
 * partial aggregation combines map-side and the shuffle carries
 * O(groups × n) ids — never a per-group window, whose single partition per
 * group cannot be split when one source holds a large share of 10^12 docs.
 */
object Sampling {

  /** Split-assignment column: buckets the id hash into `buckets` and maps
    * cumulative fraction ranges to split names. Fractions must sum to 1
    * (±1e-9); each split takes `floor(cumFraction · buckets)` boundaries so
    * the assignment is exact integer arithmetic. */
  def hashSplitColumn(idCol: Column, splits: Seq[(String, Double)],
                      buckets: Int = 10000,
                      portable: Boolean = true): Column = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = if (portable) Text.portableHash(idCol) else Text.fastHash(idCol)
    val bucket = pmod(h, lit(buckets))
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c * buckets).toLong)
    // the last bound is `buckets` (fractions sum to 1) so every bucket value
    // is covered; the otherwise() keeps the expression total
    val assigned = splits.zip(bounds).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), acc) => when(bucket < bound, name).otherwise(acc)
    }
    // a null id has no stable identity to key on — it must get a null split,
    // not silently pool in the last split and contaminate the eval set
    // (validation flags null ids; callers decide their fate explicitly)
    when(idCol.isNull, lit(null)).otherwise(assigned)
  }

  /** Adds a `split` column — default 80/10/10 train/val/test. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)] =
                  Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                buckets: Int = 10000, portable: Boolean = true): DataFrame =
    df.withColumn("split", hashSplitColumn(col(idCol), splits, buckets, portable))

  /** Keep-decision column for per-group deterministic fraction sampling:
    * keeps a row iff `hash(id + '#' + salt) mod buckets` falls under its
    * group's threshold `rint(fraction · buckets)` (nearest-integer, so 0.3
    * means 3000/10000 buckets — `floor` would yield 2999 from the double
    * 0.3·10000 = 2999.999…). The salt DECOUPLES this decision from
    * [[hashSplitColumn]] and from any other sampling pass: without it,
    * sampling at 0.5 would keep exactly the buckets train/val/test were
    * carved from, so the sample's split mix would be degenerate, not
    * representative. Null group → `defaultFraction`; null id → never kept
    * (no stable identity to key on — same rule as the null split).
    *
    * Fractions are realized in expectation (each id is an independent
    * deterministic coin), which is what a 10^12-doc mixture needs: exact
    * per-group counts would take a global sort or per-group windows; a
    * hash-fraction stays a pure projection, is stable under retries and
    * backfills (the SAME doc is kept on every re-run), and composes with
    * incremental ingestion (new docs don't flip old keep decisions). */
  def stratifiedKeepColumn(idCol: Column, groupCol: Column,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0,
                           salt: String = "strata",
                           buckets: Int = 10000,
                           portable: Boolean = true): Column = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction out of [0,1]: $f"))
    val salted = concat(idCol.cast("string"), lit("#" + salt))
    val h = if (portable) Text.portableHash(salted) else Text.fastHash(salted)
    val bucket = pmod(h, lit(buckets))
    def bound(f: Double): Long = math.rint(f * buckets).toLong
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(bound(defaultFraction)): Column) {
        case ((g, f), acc) => when(groupCol === g, bound(f)).otherwise(acc)
      }
    idCol.isNotNull && bucket < threshold
  }

  /** Filters `df` to the per-group deterministic sample. */
  def stratifiedHashSample(df: DataFrame, idCol: String, groupCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0,
                           salt: String = "strata",
                           buckets: Int = 10000,
                           portable: Boolean = true): DataFrame =
    df.where(stratifiedKeepColumn(col(idCol), col(groupCol), fractions,
      defaultFraction, salt, buckets, portable))

  /** Per-group keep fractions that realize a target mixture: sources get
    * expected counts proportional to `weights` (normalized over positive
    * entries), totalling `targetTotal` — unless a bottleneck source can't
    * supply its share, in which case the TOTAL is scaled down so the realized
    * RATIOS still match the weights exactly (the ratios are the point of
    * mixture sampling; silently clamping one source would skew every other
    * source's share). Driver-side pure math over per-group counts. */
  def mixtureFractions(groupCounts: Map[String, Long],
                       weights: Map[String, Double],
                       targetTotal: Long): Map[String, Double] = {
    require(targetTotal > 0, "targetTotal must be positive")
    weights.values.foreach(w => require(w >= 0, s"negative weight: $w"))
    val pos = weights.filter(_._2 > 0)
    require(pos.nonEmpty, "need at least one positive weight")
    val norm = pos.values.sum
    val wn = pos.map { case (g, w) => g -> w / norm }
    val feasibleTotal = wn.map { case (g, w) =>
      val c = groupCounts.getOrElse(g, 0L)
      require(c > 0, s"mixture weight on empty/absent group '$g'")
      c / w
    }.min
    val t = math.min(targetTotal.toDouble, feasibleTotal)
    wn.map { case (g, w) => g -> math.min(1.0, w * t / groupCounts(g)) }
  }

  /** One-call mixture sampling: ONE count aggregate over the group column
    * (tiny result — one row per group), driver-side fraction solve, then the
    * zero-shuffle stratified filter. Groups with no weight get fraction 0. */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    weights: Map[String, Double], targetTotal: Long,
                    salt: String = "strata", buckets: Int = 10000,
                    portable: Boolean = true): DataFrame = {
    // group key cast to string in the AGGREGATE (not getString on the
    // driver row): an int/long-typed group column threw ClassCastException
    // after the count job already ran (ADVICE r5). The fraction map is
    // string-keyed either way, and stratifiedKeepColumn's `groupCol === key`
    // comparison coerces the literal back to the column type, so string
    // group columns behave exactly as before.
    val counts = df.where(col(groupCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fr = mixtureFractions(counts, weights, targetTotal)
    stratifiedHashSample(df, idCol, groupCol, fr,
      defaultFraction = 0.0, salt, buckets, portable)
  }

  /** The `n` smallest distinct non-null ids per group, exploded to
    * (group, id) rows. One bounded-state aggregate (see scale note above). */
  def quotaIds(df: DataFrame, groupCol: String, idCol: String,
               n: Int): DataFrame =
    df.where(col(idCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(graft.functions.Collect.cappedMinLong(n)(col(idCol)).as("ids"))
      .select(col("group"), explode(col("ids")).as("id"))

  /** Full rows of the per-group quota: the kept-id set (≤ groups × n rows)
    * joins back LEFT SEMI — broadcast-able whenever groups × n is. */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String,
                  n: Int): DataFrame = {
    val kept = quotaIds(df, groupCol, idCol, n)
      .withColumnRenamed("group", "__g").withColumnRenamed("id", "__i")
    df.join(kept,
      df(groupCol) <=> kept("__g") && df(idCol) === kept("__i"), "left_semi")
  }
}
