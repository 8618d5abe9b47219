package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine capability.
  *
  * @param name   stable key — `Verify` writes `outDir/<name>.parquet`
  * @param run    the Spark-side query; receives the session and the testdata
  *               scale-factor directory
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet files
  *               (None for ops not expressible in SQL → rows-only check).
  *               Column names/aliases must match `run`'s output exactly.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** All query modules, in SURVEY §2 inventory order. */
  def modules: Seq[Seq[QueryDef]] = Seq(
    operators.TpchQueries.defs,
    operators.FilterQueries.defs,
    operators.ScalarFunctionQueries.defs,
    operators.JoinQueries.defs,
    operators.AggregateQueries.defs,
    operators.WindowQueries.defs,
    operators.SetOpQueries.defs,
    operators.SortLimitQueries.defs,
    operators.SubqueryQueries.defs,
    operators.DdlDmlQueries.defs,
    operators.DedupQueries.defs,
    operators.GraphQueries.defs,
    operators.TextQueries.defs,
    operators.BpeQueries.defs,
    operators.VectorQueries.defs,
    operators.EventsQueries.defs,
    operators.TemporalJoinQueries.defs,
    operators.MultimodalQueries.defs
  )

  lazy val all: Seq[QueryDef] = modules.flatten
}
