package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec,
  ProjectExec, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
  ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec,
  ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final,
  Partial, PartialMerge}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}

/** Per-step execution trace — the `calsettrace`/`calgettrace` analog.
  *
  * The reference's trace facility stamps every job step with its row
  * count and I/O counters after the query runs (reference:
  * dbcon/mysql/ha_calpont_impl.cpp:2197 calgettrace returns the
  * accumulated extendedStats; dbcon/joblist/tuple-bps.cpp:2318 formats
  * per-step `PhyI/O- CacheI/O- BlocksTouched- Rows-` lines;
  * joblist.h:79 querySummary collects them). Here the executed
  * SparkPlan IS the job-step list: after running the plan we walk it in
  * execution (leaf-to-root) order, classify each operator onto the
  * reference's step vocabulary, and read its `numOutputRows` SQL metric
  * — the same "rows delivered by this step" number the reference
  * prints.
  *
  * The reference's exemgr executes a STATIC job plan (no adaptive
  * replan), so the traced job runs with AQE off: the trace then reports
  * the planned tree verbatim, and its shape is deterministic — which
  * lets the DuckDB oracle pin both the step sequence AND the row counts
  * of the semantically-determined steps (filter output, final aggregate
  * groups, post-aggregate sort/exchange). Steps whose counts depend on
  * physical partitioning (scan, partial aggregate, pre-agg exchange)
  * report NULL to the oracle and their live metric to callers.
  */
object QueryTrace {

  /** Map a physical node onto the reference's step vocabulary; None for
    * wrappers that aren't job steps. */
  private def classify(p: SparkPlan): Option[String] = p match {
    case _: FileSourceScanExec => Some("scan")
    case _: FilterExec => Some("filter")
    case _: ProjectExec => None // pure column arithmetic, never changes rows
    case a: HashAggregateExec => Some(aggKind(a.aggregateExpressions.map(_.mode)))
    case a: ObjectHashAggregateExec =>
      Some(aggKind(a.aggregateExpressions.map(_.mode)))
    case a: SortAggregateExec => Some(aggKind(a.aggregateExpressions.map(_.mode)))
    case _: ShuffleExchangeExec => Some("exchange")
    case _: BroadcastExchangeExec => Some("broadcast")
    case _: SortExec => Some("sort")
    case _: TakeOrderedAndProjectExec => Some("topk")
    case _: BroadcastHashJoinExec | _: ShuffledHashJoinExec |
        _: SortMergeJoinExec => Some("join")
    case _ => None // codegen/adapter/columnar wrappers — not job steps
  }

  private def aggKind(
      modes: Seq[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateMode])
      : String =
    if (modes.forall(m => m == Partial || m == PartialMerge)) "agg_partial"
    else if (modes.forall(m => m == Final || m == Complete)) "agg_final"
    else "agg_mixed"

  /** Steps whose delivered-row count is a semantic property of the
    * query (so the oracle can predict it) rather than of physical
    * partitioning. A broadcast exchange delivers its whole (filtered)
    * build side, so it is semantic too. NOTE: any step BELOW a range
    * exchange is excluded by construction — the range partitioner's
    * sampling pass re-executes the child stage and inflates its
    * metrics, so traced jobs avoid global sorts (top-k plans a sampling-
    * free TakeOrderedAndProject instead). */
  private def deterministic(kind: String): Boolean =
    kind match {
      case "filter" | "agg_final" | "join" | "topk" | "broadcast" => true
      case _ => false
    }

  /** Execute `build`'s plan with AQE off and return the trace table:
    * (step_no, step, rows_out, rows_oracle) in execution order, where
    * rows_oracle is rows_out for semantically-determined steps and NULL
    * otherwise. */
  def trace(s: SparkSession, build: => DataFrame): DataFrame = {
    val key = "spark.sql.adaptive.enabled"
    // build FIRST (table resolution may itself touch session confs),
    // then materialize the physical plan under adaptive=off — planning
    // happens at the first executedPlan access, not at construction
    val qe = build.queryExecution
    val prev = s.conf.get(key)
    try { s.conf.set(key, "false"); qe.executedPlan }
    finally s.conf.set(key, prev)
    qe.toRdd.foreach(_ => ()) // run the exact executed plan, distributed
    // leaf-to-root = execution order (single-chain per branch; joins
    // interleave their build side before the probe, like the
    // reference's step list ordering)
    val steps = qe.executedPlan.collect { case p => p }.reverse
    val rows = steps.flatMap { p =>
      classify(p).map { kind =>
        val n = p.metrics.get("numOutputRows").map(_.value)
        (kind, n, if (deterministic(kind)) n else None)
      }
    }.zipWithIndex.map { case ((kind, n, det), i) =>
      Row(i + 1, kind, n.map(Long.box).orNull, det.map(Long.box).orNull)
    }
    val schema = StructType(Seq(
      StructField("step_no", IntegerType, nullable = false),
      StructField("step", StringType, nullable = false),
      StructField("rows_out", LongType, nullable = true),
      StructField("rows_oracle", LongType, nullable = true)))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
