package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded example collection: keep the `cap` SMALLEST distinct non-null
 * values seen. Unlike `collect_list(...)` + `slice` (which accumulates the
 * whole column per group before truncating), state never exceeds `cap`
 * values — safe inside a wide aggregate over 10^12 rows. Deterministic under
 * any partitioning/merge order (min-set is associative + commutative), which
 * `limit(n)`-style example collection is not.
 *
 * One generic implementation serves both element types (the invariant lives
 * in exactly one place): the string front-end backs the semantic validators'
 * per-issue example values (reference collects 3 examples per issue —
 * `/root/reference/src/semantic_pipeline/validator.py:47,60,72`); the long
 * front-end backs the per-group quota sampler ([[graft.sample.Sampling]]).
 */
abstract class CappedMinBase[I, T](cap: Int, in: I => Option[T])(
    implicit ord: Ordering[T]) extends Aggregator[I, Seq[T], Seq[T]] {
  require(cap > 0)
  def zero: Seq[T] = Vector.empty
  // buffer invariant: sorted ascending, ≤ cap values. Most rows exit on the
  // cheap `v >= last` rejection; an accepted value pays one O(cap) ordered
  // insertion, not the O(cap·log cap) full re-sort a naive append-and-sort
  // pays per row — matters if a caller raises cap for wider example sets.
  def reduce(b: Seq[T], raw: I): Seq[T] = in(raw) match {
    case None => b
    case Some(v) =>
      if ((b.size == cap && ord.gteq(v, b.last)) || b.contains(v)) b
      else {
        val at = b.indexWhere(x => ord.gt(x, v)) match {
          case -1 => b.size; case i => i
        }
        val ins = (b.take(at) :+ v) ++ b.drop(at)
        if (ins.size > cap) ins.init else ins
      }
  }
  def merge(a: Seq[T], b: Seq[T]): Seq[T] =
    (a ++ b).distinct.sorted.take(cap)
  def finish(s: Seq[T]): Seq[T] = s
}

/** String front-end (nulls skipped, so `when(mask, col)` collects only
  * masked rows). */
class CappedMinCollect(cap: Int)
    extends CappedMinBase[String, String](cap, Option(_)) {
  def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

/** Long front-end (nulls skipped). */
class CappedMinLongCollect(cap: Int)
    extends CappedMinBase[java.lang.Long, Long](cap,
      (x: java.lang.Long) => Option(x).map(_.longValue())) {
  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object Collect {
  /** Column aggregate: `cap` smallest distinct non-null values of a string
    * column. */
  def cappedMin(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CappedMinCollect(cap), Encoders.STRING)

  /** Long-typed variant (nulls skipped). */
  def cappedMinLong(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CappedMinLongCollect(cap), Encoders.LONG)
}
