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
