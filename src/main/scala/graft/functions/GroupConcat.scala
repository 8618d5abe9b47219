package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (sortKey, value) pair flowing into GROUP_CONCAT. */
case class GcInput(sortKey: String, value: String)

/** MySQL-exact GROUP_CONCAT([DISTINCT] value ORDER BY sortKey SEPARATOR sep)
  * with group_concat_max_len truncation.
  *
  * The reference implements this as a dedicated UM-side aggregation with
  * DISTINCT / ORDER BY / SEPARATOR / length-cap support
  * (reference: dbcon/joblist/groupconcat.cpp (1,021 LoC), groupconcat.h:99).
  * Spark's built-in collect_list/listagg has no deterministic ordering
  * guarantee, so parity needs this small typed Aggregator.
  *
  * The buffer is a plain Seq[Seq[String]] so its encoder is a Catalyst
  * array-of-array (no kryo blobs in the aggregation buffer); merge is
  * associative, so Spark still plans partial (map-side) aggregation.
  * Sort keys compare as strings — numeric keys should be zero-padded by the
  * caller (same contract MySQL has for string collation ordering).
  */
class GroupConcat(sep: String, maxLen: Int, distinct: Boolean)
    extends Aggregator[GcInput, Seq[Seq[String]], String] with Serializable {
  override def zero: Seq[Seq[String]] = Vector.empty
  override def reduce(b: Seq[Seq[String]], a: GcInput): Seq[Seq[String]] =
    if (a.value == null) b else b :+ Seq(a.sortKey, a.value)
  override def merge(b1: Seq[Seq[String]], b2: Seq[Seq[String]]): Seq[Seq[String]] =
    b1 ++ b2
  override def finish(b: Seq[Seq[String]]): String = {
    // NULL sort keys order first, matching MySQL's ORDER BY ASC default
    val sorted = b.sortBy(r => (Option(r(0)), r(1))).map(_(1))
    val vals = if (distinct) sorted.distinct else sorted
    val out = vals.mkString(sep)
    if (out.length > maxLen) out.substring(0, maxLen) else out
  }
  override def bufferEncoder: Encoder[Seq[Seq[String]]] =
    ExpressionEncoder[Seq[Seq[String]]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object GroupConcat {
  /** Column-level API: group_concat([DISTINCT] value ORDER BY sortKey
    * SEPARATOR sep), truncated at maxLen chars. */
  def groupConcat(sortKey: Column, value: Column, sep: String = ",",
      maxLen: Int = 1024, distinct: Boolean = false): Column = {
    val agg = udaf(new GroupConcat(sep, maxLen, distinct),
      Encoders.product[GcInput])
    agg(sortKey.cast("string"), value.cast("string"))
  }
}
