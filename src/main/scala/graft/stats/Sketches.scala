package graft.stats

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Mergeable sketch aggregates (SURVEY §2.11): exportable per-partition state
 * that can be persisted in the metrics ledger and merged across runs — the
 * property `approx_count_distinct` / `percentile_approx` lack (they return
 * only the final estimate).
 *
 * Both are `Aggregator`s (Catalyst-typed, partial-merge friendly: Spark
 * runs reduce per partition and merge at the exchange, so the driver never
 * sees raw rows).
 */
object Sketches {

  // --------------------------------------------------------------------- HLL

  /** Dense HyperLogLog registers, p = log2(#registers). Standard HLL with the
    * usual small-range (linear counting) correction; good to ~1.04/√m rel.
    * error. State = m bytes → serializable into a ledger row and mergeable
    * across runs by register-wise max. */
  case class HllState(registers: Array[Byte]) {
    def merge(o: HllState): HllState = {
      val out = new Array[Byte](registers.length)
      var i = 0
      while (i < out.length) {
        out(i) = math.max(registers(i), o.registers(i)).toByte; i += 1 }
      HllState(out)
    }
    def estimate: Long = {
      val m = registers.length
      val alpha = m match {
        case 16 => 0.673; case 32 => 0.697; case 64 => 0.709
        case _ => 0.7213 / (1 + 1.079 / m)
      }
      var sum = 0.0; var zeros = 0; var i = 0
      while (i < m) {
        sum += math.pow(2.0, -registers(i))
        if (registers(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / sum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      math.round(est)
    }
  }

  class HllAggregator(p: Int = 12) extends Aggregator[Long, HllState, Long] {
    private val m = 1 << p
    def zero: HllState = HllState(new Array[Byte](m))
    def reduce(s: HllState, hash: Long): HllState = {
      // hash is assumed uniform (xxhash64 upstream); bucket = low p bits,
      // rank = leading-zeros+1 of the remaining bits
      val bucket = (hash & (m - 1)).toInt
      val w = hash >>> p
      val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfTrailingZeros(w)) + 1
      if (rank > s.registers(bucket)) s.registers(bucket) = rank.toByte
      s
    }
    def merge(a: HllState, b: HllState): HllState = a.merge(b)
    def finish(s: HllState): Long = s.estimate
    def bufferEncoder: Encoder[HllState] = Encoders.product[HllState]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column function: HLL distinct-count of xxhash64(col). Usage:
    * `df.agg(hllCountDistinct(xxhash64(col("x"))))`. */
  def hllCountDistinct(p: Int = 12): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new HllAggregator(p), Encoders.scalaLong)

  /** Registers-exporting variant for the ledger (output = serialized state). */
  class HllSketchAggregator(p: Int = 12) extends Aggregator[Long, HllState, Array[Byte]] {
    private val inner = new HllAggregator(p)
    def zero: HllState = inner.zero
    def reduce(s: HllState, v: Long): HllState = inner.reduce(s, v)
    def merge(a: HllState, b: HllState): HllState = a.merge(b)
    def finish(s: HllState): Array[Byte] = s.registers
    def bufferEncoder: Encoder[HllState] = Encoders.product[HllState]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
  def hllSketch(p: Int = 12): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new HllSketchAggregator(p), Encoders.scalaLong)

  /** Merge previously-exported register arrays (ledger → combined estimate). */
  def mergeHllSketches(sketches: Seq[Array[Byte]]): Long =
    sketches.map(HllState(_)).reduce(_ merge _).estimate

  // ----------------------------------------------------------- histogram

  /** Fixed-bin mergeable histogram over [lo, hi): bin counts are plain longs,
    * merge = element-wise add — the simplest exportable distribution sketch;
    * feeds the KS/χ² drift checks ([[Drift]]). Values outside the range clamp
    * to the edge bins, nulls are skipped by Spark before reduce. */
  case class HistState(counts: Array[Long]) {
    def merge(o: HistState): HistState = {
      val out = new Array[Long](counts.length)
      var i = 0
      while (i < out.length) { out(i) = counts(i) + o.counts(i); i += 1 }
      HistState(out)
    }
  }

  class HistogramAggregator(lo: Double, hi: Double, bins: Int)
      extends Aggregator[Double, HistState, Array[Long]] {
    def zero: HistState = HistState(new Array[Long](bins))
    def reduce(s: HistState, v: Double): HistState = {
      val idx0 = ((v - lo) / (hi - lo) * bins).toInt
      val idx = math.min(math.max(idx0, 0), bins - 1)
      s.counts(idx) += 1
      s
    }
    def merge(a: HistState, b: HistState): HistState = a.merge(b)
    def finish(s: HistState): Array[Long] = s.counts
    def bufferEncoder: Encoder[HistState] = Encoders.product[HistState]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  def histogram(lo: Double, hi: Double, bins: Int = 64): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new HistogramAggregator(lo, hi, bins), Encoders.scalaDouble)
}
