package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregates over a total order — the scalable
  * replacement for `Window.orderBy(...)` with no partition spec.
  *
  * An unpartitioned window funnels EVERY row through one task — the one
  * plan shape that cannot survive a 100× scale-up (Spark itself warns
  * "No Partition Defined for Window operation"). The reference engine has
  * no such shape either: its ordered aggregation runs as a merge of
  * per-PM ordered streams (reference: dbcon/joblist/windowfunctionstep.cpp
  * parallel window execution over tuple ranges). This helper is the
  * classic two-level parallel prefix-scan, expressed in DataFrame ops:
  *
  *   1. `repartitionByRange` on the sort keys — partition i holds a
  *      contiguous key range, and `spark_partition_id()` is monotone in
  *      the sort order;
  *   2. run the running aggregate WITHIN each partition with a window
  *      partitioned by that id (parallel, no warning);
  *   3. compute one total per partition (a |partitions|-row table),
  *      derive each partition's prefix-of-previous-partitions offset with
  *      a tiny broadcast self-join, and fold the offset into the local
  *      running value.
  *
  * The result is independent of the sampled range boundaries: any
  * monotone bucketing yields the same global prefix values. Only use
  * order-insensitive combine monoids here (integer/decimal sums, min,
  * max, row counts) — raw-double running sums would change their fp
  * association order between the local and offset levels; round through
  * DECIMAL first, as the rest of the repo does.
  */
object Prefix {

  /** One requested running aggregate.
    *
    * @param kind      "sum" | "min" | "max" | "rownum" ("rownum" ignores
    *                  `value` and yields the 1-based global row number —
    *                  equal to rank() when the order keys are unique)
    * @param inclusive frame end: current row (true) or previous row
    *                  (false, i.e. ROWS UNBOUNDED PRECEDING TO 1
    *                  PRECEDING; NULL when no row precedes globally,
    *                  matching window semantics)
    */
  final case class Agg(value: Column, out: String, kind: String,
      inclusive: Boolean = true)

  def sumOf(value: Column, out: String, inclusive: Boolean = true): Agg =
    Agg(value, out, "sum", inclusive)
  def minOf(value: Column, out: String, inclusive: Boolean = true): Agg =
    Agg(value, out, "min", inclusive)
  def maxOf(value: Column, out: String, inclusive: Boolean = true): Agg =
    Agg(value, out, "max", inclusive)
  def rowNumber(out: String): Agg = Agg(lit(1L), out, "rownum")

  private def fold(kind: String, c: Column): Column = kind match {
    case "sum" | "rownum" => sum(c)
    case "min" => min(c)
    case "max" => max(c)
  }

  /** Returns `df` plus one column per requested aggregate, each holding
    * the running value over the GLOBAL `order`, computed with only
    * partitioned windows and a |partitions|-row broadcast join.
    *
    * `numParts` is the scan fan-out: ≤ 0 (the default) follows
    * `spark.sql.shuffle.partitions`, so the same code spreads over 32
    * local threads or a 1000-executor cluster; pass a small explicit
    * value for bounded domains. The offset merge is O(fan-out²) rows in
    * one broadcast join — trivial at any realistic setting.
    */
  def over(df: DataFrame, order: Seq[Column], aggs: Seq[Agg],
      numParts: Int = 0): DataFrame = {
    val nP =
      if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val pid = "__prefix_pid"
    // MATERIALIZED once (Checkpoints.barrier): the running-value branch
    // and the per-partition-totals branch below both consume this table,
    // and without the barrier each branch could re-execute the range
    // exchange independently — range boundary SAMPLING is row-order-
    // sensitive, so two evaluations can disagree on partition ids and
    // corrupt the merged prefix values (observed at sf0.1: duplicate +
    // missing ranks). Freezing the partitioned table pins one consistent
    // pid assignment for both branches.
    val parts = graft.sources.Checkpoints.barrier(
      df.repartitionByRange(nP, order: _*)
        .withColumn(pid, spark_partition_id()))
    val base = Window.partitionBy(col(pid)).orderBy(order: _*)
    val wInc = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExc = base.rowsBetween(Window.unboundedPreceding, -1)

    val local = aggs.foldLeft(parts) { (d, a) =>
      d.withColumn(s"__loc_${a.out}",
        fold(a.kind, a.value).over(if (a.inclusive) wInc else wExc))
    }

    val totCols = aggs.map(a => fold(a.kind, a.value).as(s"__tot_${a.out}"))
    val totals = parts.groupBy(col(pid)).agg(totCols.head, totCols.tail: _*)

    // each partition's offset = fold of ALL earlier partitions' totals —
    // a |partitions|² broadcast join, trivially small
    val offCols = aggs.map(a =>
      fold(a.kind, col(s"b.__tot_${a.out}")).as(s"__off_${a.out}"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col(s"b.$pid") < col(s"a.$pid"), "left")
      .groupBy(col(s"a.$pid").as(pid))
      .agg(offCols.head, offCols.tail: _*)

    def combine(a: Agg): Column = {
      val off = col(s"__off_${a.out}")
      val loc = col(s"__loc_${a.out}")
      val merged = a.kind match {
        case "sum" | "rownum" =>
          local.schema(s"__loc_${a.out}").dataType match {
            // max-precision decimals would lose their last scale digit on
            // addition (decimal(38,s) + decimal(38,s) adjusts to scale
            // s-1 under Spark's precision-loss rule — breaking the exact-
            // DECIMAL accumulation contract callers rely on); stepping
            // the operands down one integer digit keeps the add inside
            // 38 digits at FULL scale. try_cast + coalesce keeps the
            // helper total even for callers with ≥ 10^(37-s) running
            // sums: the narrowed cast nulls out instead of failing and
            // the plain (scale-losing, magnitude-correct) add takes
            // over. scale 38 has no narrowing headroom — plain add.
            case d: org.apache.spark.sql.types.DecimalType
                if d.precision == 38 && d.scale <= 37 =>
              val narrowed =
                org.apache.spark.sql.types.DecimalType(37, d.scale)
              // the fallback must ALSO be cast to d: coalesce coerces its
              // branches to a common type, and decimal(38,s-1) from the
              // plain add would drag the exact branch back down to s-1
              coalesce(
                (off.try_cast(narrowed) + loc.try_cast(narrowed)).cast(d),
                (off + loc).cast(d))
            case _ => off + loc
          }
        case "min" => least(off, loc)
        case "max" => greatest(off, loc)
      }
      when(off.isNull, loc).otherwise(when(loc.isNull, off).otherwise(merged))
    }
    val joined = local.join(broadcast(offsets), Seq(pid), "left")
    val out = aggs.foldLeft(joined) { (d, a) =>
      d.withColumn(a.out, combine(a))
    }
    out.drop(pid +: aggs.flatMap(a =>
      Seq(s"__loc_${a.out}", s"__off_${a.out}")): _*)
  }
}
