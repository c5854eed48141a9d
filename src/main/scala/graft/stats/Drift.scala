package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-drift checks (SURVEY A26, north rule: "two-sample KS /
 * chi-square over quantile sketches").
 *
 * The reference only compares means against a tolerance
 * (`/root/reference/src/engine/report/quality_report.py:113-136`); the north
 * rule upgrades this to proper two-sample statistics computed from
 * per-partition sketches:
 *
 *  1. each side (baseline vs current) is reduced to a quantile vector /
 *     histogram with ONE `percentile_approx` (or [[Sketches.histogram]]) agg —
 *     never a row-level comparison between the two tables;
 *  2. KS statistic and χ² are driver-side folds over the two small vectors.
 *
 * This keeps the drift check O(sketch size) on the driver and one scan per
 * side on the cluster, mergeable across partitions and resumable from the
 * ledger (histograms add; quantile vectors recompute per partition set).
 */
object Drift {

  /** Mean-shift check, faithfully mirroring the reference's tolerance rule:
    * tolerance = 0.15·σ_baseline / (importance + 0.1); drift if
    * |μ_cur − μ_base| > tolerance (`quality_report.py:113-136`). */
  case class MeanShift(column: String, baselineMean: Double, currentMean: Double,
                       tolerance: Double, drifted: Boolean, penalty: Double)

  def meanShift(baseMean: Double, baseStd: Double, curMean: Double,
                column: String, importance: Double = 1.0): MeanShift = {
    val tol = 0.15 * baseStd / (importance + 0.1)
    val dev = math.abs(curMean - baseMean)
    // penalty per quality_report.py:130-134: (Δ/σ)·5·importance, importance
    // supplied by the A15 fold (Importance.fromProfile), not a constant
    val penalty =
      if (dev > tol) dev / (baseStd + 1e-9) * 5.0 * importance else 0.0
    MeanShift(column, baseMean, curMean, tol, dev > tol, penalty)
  }

  /** Equi-spaced quantile vector (CDF sample) of a numeric column: one
    * `percentile_approx` agg, `q` points. */
  def quantileVector(df: DataFrame, c: String, q: Int = 64): Array[Double] = {
    val probs = array((1 to q).map(i => lit(i.toDouble / (q + 1))): _*)
    val row = df.agg(percentile_approx(col(c).cast("double"), probs,
      lit(10000)).as("q")).collect()(0)
    if (row.isNullAt(0)) Array.empty
    else row.getSeq[Double](0).toArray
  }

  /**
   * Two-sample KS statistic from two quantile vectors of equal length.
   * For quantile vectors Qa, Qb sampled at the same probabilities p_i, the KS
   * statistic is approximated by the max CDF gap over the merged support:
   * D = max_x |F_a(x) − F_b(x)| where F is linearly interpolated from (Q, p).
   */
  def ksFromQuantiles(qa: Array[Double], qb: Array[Double]): Double = {
    if (qa.isEmpty || qb.isEmpty) return 0.0
    val n = qa.length
    val probs = (1 to n).map(_.toDouble / (n + 1)).toArray
    def cdf(qs: Array[Double], x: Double): Double = {
      if (x <= qs.head) return 0.0
      if (x >= qs.last) return 1.0
      var i = qs.indexWhere(_ > x) // first quantile above x
      val (x0, x1) = (qs(i - 1), qs(i))
      val (p0, p1) = (probs(i - 1), probs(i))
      if (x1 == x0) p1 else p0 + (p1 - p0) * (x - x0) / (x1 - x0)
    }
    val support = (qa ++ qb).distinct.sorted
    support.map(x => math.abs(cdf(qa, x) - cdf(qb, x))).max
  }

  /** Two-sample χ² from two aligned histograms (same bin edges). Bins empty
    * on both sides are skipped; expected counts are scaled for unequal totals
    * (standard two-sample χ² with K1/K2 scaling). */
  case class Chi2Result(statistic: Double, dof: Int)
  def chi2FromHistograms(a: Array[Long], b: Array[Long]): Chi2Result = {
    require(a.length == b.length, "histograms must share bin edges")
    val na = a.sum.toDouble; val nb = b.sum.toDouble
    if (na == 0 || nb == 0) return Chi2Result(0.0, 0)
    val k1 = math.sqrt(nb / na); val k2 = math.sqrt(na / nb)
    var stat = 0.0; var used = 0
    a.indices.foreach { i =>
      val (ai, bi) = (a(i).toDouble, b(i).toDouble)
      if (ai + bi > 0) {
        val d = k1 * ai - k2 * bi
        stat += d * d / (ai + bi)
        used += 1
      }
    }
    Chi2Result(stat, math.max(used - 1, 0))
  }

  /** Critical KS threshold at alpha=0.05 for samples of size na, nb. */
  def ksThreshold(na: Long, nb: Long, cAlpha: Double = 1.358): Double =
    cAlpha * math.sqrt((na + nb).toDouble / (na.toDouble * nb))

  case class DriftReport(column: String, ks: Double, ksThreshold: Double,
                         ksDrifted: Boolean, chi2: Double, chi2Dof: Int,
                         chi2Drifted: Boolean)

  /** Full drift check of one numeric column between two tables: one agg per
    * side for quantiles + one per side for histograms (over the combined
    * min/max range), statistics on the driver. */
  def check(baseline: DataFrame, current: DataFrame, c: String,
            bins: Int = 64, alpha: Double = 1.358): DriftReport = {
    val qa = quantileVector(baseline, c, bins)
    val qb = quantileVector(current, c, bins)
    val ks = ksFromQuantiles(qa, qb)
    // shared histogram range from the quantile extremes (robust to outliers)
    val lo = math.min(qa.headOption.getOrElse(0.0), qb.headOption.getOrElse(0.0))
    val hi0 = math.max(qa.lastOption.getOrElse(1.0), qb.lastOption.getOrElse(1.0))
    val hi = if (hi0 == lo) lo + 1 else hi0
    val hAgg = Sketches.histogram(lo, hi, bins)
    def hist(df: DataFrame): (Array[Long], Long) = {
      val r = df.agg(hAgg(col(c).cast("double")).as("h"),
        count(col(c)).as("n")).collect()(0)
      (r.getSeq[Long](0).toArray, r.getLong(1))
    }
    val (ha, na) = hist(baseline)
    val (hb, nb) = hist(current)
    val chi2 = chi2FromHistograms(ha, hb)
    val thr = ksThreshold(na, nb, alpha)
    // χ² critical value ~ dof + 3·sqrt(2·dof) (≈ p<0.01 for moderate dof)
    val chi2Crit = chi2.dof + 3.0 * math.sqrt(2.0 * chi2.dof)
    DriftReport(c, ks, thr, ks > thr, chi2.statistic, chi2.dof,
      chi2.dof > 0 && chi2.statistic > chi2Crit)
  }

  /** χ² drift over a categorical column: value-count join on the (small)
    * union of categories, statistic on the driver. */
  def checkCategorical(baseline: DataFrame, current: DataFrame, c: String): Chi2Result = {
    val a = baseline.groupBy(col(c)).agg(count(lit(1)).as("na"))
    val b = current.groupBy(col(c)).agg(count(lit(1)).as("nb"))
    val joined = a.join(b, Seq(c), "full_outer")
      .select(coalesce(col("na"), lit(0L)).as("na"),
              coalesce(col("nb"), lit(0L)).as("nb")).collect()
    chi2FromHistograms(joined.map(_.getLong(0)), joined.map(_.getLong(1)))
  }
}
