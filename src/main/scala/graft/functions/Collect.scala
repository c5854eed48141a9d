package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded example collection: keep the `cap` SMALLEST distinct non-null
 * strings seen. Unlike `collect_list(...)` + `slice` (which accumulates the
 * whole column per group before truncating), state never exceeds `cap`
 * values — safe inside a wide aggregate over 10^12 rows. Deterministic under
 * any partitioning/merge order (min-set is associative + commutative), which
 * `limit(n)`-style example collection is not.
 *
 * Used by the semantic validators to fold per-issue example values into the
 * single wide agg (reference collects 3 examples per issue —
 * `/root/reference/src/semantic_pipeline/validator.py:47,60,72`).
 */
class CappedMinCollect(cap: Int) extends Aggregator[String, Seq[String], Seq[String]] {
  require(cap > 0)
  def zero: Seq[String] = Vector.empty
  // buffer invariant: sorted ascending, ≤ cap values. Most rows exit on the
  // cheap `v >= last` rejection; an accepted value pays one O(cap) ordered
  // insertion, not the O(cap·log cap) full re-sort a naive append-and-sort
  // pays per row — matters if a caller raises cap for wider example sets.
  def reduce(b: Seq[String], v: String): Seq[String] = {
    if (v == null || (b.size == cap && v >= b.last) || b.contains(v)) return b
    val at = b.indexWhere(_ > v) match { case -1 => b.size; case i => i }
    val ins = (b.take(at) :+ v) ++ b.drop(at)
    if (ins.size > cap) ins.init else ins
  }
  def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    (a ++ b).distinct.sorted.take(cap)
  def finish(s: Seq[String]): Seq[String] = s
  def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

/** [[CappedMinCollect]] for LONG ids — same bounded-state contract: state
  * never exceeds `cap` values, deterministic under any merge order. Backs
  * the per-group quota sampler (n smallest ids per group as ONE map-side-
  * combining aggregate instead of a per-group window, whose partitions
  * cannot be split when one group holds a large share of 10^12 rows). */
class CappedMinLongCollect(cap: Int)
    extends Aggregator[java.lang.Long, Seq[Long], Seq[Long]] {
  require(cap > 0)
  def zero: Seq[Long] = Vector.empty
  def reduce(b: Seq[Long], boxed: java.lang.Long): Seq[Long] = {
    if (boxed == null) return b
    val v = boxed.longValue()
    if ((b.size == cap && v >= b.last) || b.contains(v)) return b
    val at = b.indexWhere(_ > v) match { case -1 => b.size; case i => i }
    val ins = (b.take(at) :+ v) ++ b.drop(at)
    if (ins.size > cap) ins.init else ins
  }
  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(cap)
  def finish(s: Seq[Long]): Seq[Long] = s
  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object Collect {
  /** Column aggregate: `cap` smallest distinct non-null values of a string
    * column (nulls skipped, so `when(mask, col)` collects only masked rows). */
  def cappedMin(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CappedMinCollect(cap), Encoders.STRING)

  /** Long-typed variant (nulls skipped). */
  def cappedMinLong(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CappedMinLongCollect(cap), Encoders.LONG)
}
