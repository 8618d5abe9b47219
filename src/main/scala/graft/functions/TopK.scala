package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (value, label) pair flowing into TOPK_LABELS. */
case class TkInput(v: Double, label: String)

/** TOPK_LABELS(value, label, k): per-group top-k labels by (value DESC,
  * label ASC), emitted as a comma-joined string.
  *
  * The point is the BOUNDED aggregation buffer: `reduce` and `merge` both
  * trim to k, so the map-side partial state is at most k pairs per group
  * per partition and the shuffle moves k pairs per (group, partition) —
  * never the group's row count. That's the scale-right alternative to
  * window-rank-then-filter for "top-k per key" at 100 TB: a window sorts
  * every row of every group through the shuffle; this heap-merge shape
  * is the distributed equivalent of the reference's LimitedOrderBy
  * bounded heap (reference: utils/windowfunction/limitedorderby.cpp),
  * applied per group instead of globally. Merge is associative and
  * commutative, so Spark plans partial (map-side) aggregation exactly as
  * it does for the built-in aggregates.
  *
  * Nulls: pairs with a null label are dropped (MySQL aggregate-null
  * convention, same as GROUP_CONCAT).
  */
class TopKLabels(k: Int)
    extends Aggregator[TkInput, Seq[(Double, String)], String]
    with Serializable {
  require(k > 0, s"k must be positive: $k")
  private def ordered(b: Seq[(Double, String)]): Seq[(Double, String)] =
    b.sortBy { case (v, l) => (-v, l) }
  private def trim(b: Seq[(Double, String)]): Seq[(Double, String)] =
    ordered(b).take(k)

  override def zero: Seq[(Double, String)] = Vector.empty
  override def reduce(b: Seq[(Double, String)], a: TkInput): Seq[(Double, String)] =
    if (a.label == null) b else trim(b :+ ((a.v, a.label)))
  override def merge(b1: Seq[(Double, String)],
      b2: Seq[(Double, String)]): Seq[(Double, String)] = trim(b1 ++ b2)
  override def finish(b: Seq[(Double, String)]): String =
    ordered(b).map(_._2).mkString(",")
  override def bufferEncoder: Encoder[Seq[(Double, String)]] =
    ExpressionEncoder[Seq[(Double, String)]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object TopK {
  /** Column-level API: top-k labels by (value DESC, label ASC), joined
    * with commas. */
  def topkLabels(value: Column, label: Column, k: Int): Column = {
    val agg = udaf(new TopKLabels(k), Encoders.product[TkInput])
    agg(value.cast("double"), label.cast("string"))
  }
}
