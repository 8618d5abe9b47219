package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.sources.{Catalog, TableLocks}

/** Persisted query-history statistics — the querystats analog
  * (reference: utils/querystats/querystats.h collects per-query wall
  * time / rows / session into a stats table an operator can query;
  * the perf scenarios read it back via tblTestStats.sql). graft's
  * d_query_trace explains ONE plan per run; this accumulates a
  * HISTORY: each recorded execution appends (query, wall_ms, rows,
  * ts, plan_hash, run_id) to a catalog-managed `query_history` table,
  * so regressions ("same query, same plan hash, 3× the wall"), plan
  * churn ("plan_hash changed under me"), and workload shape are
  * queryable with the engine itself.
  *
  * Storage is the same locked, crash-recoverable Catalog append path
  * every DML uses — at scale the history is just another table
  * (partition by day if it grows; each append is one small parquet
  * file, and compaction is the existing d_compaction story).
  */
object QueryStats {
  val tableName = "query_history"

  /** One recorded execution. `rows` is -1 when the caller executed
    * through a sink that doesn't report a row count (the bench's noop
    * writes); real row counts come from callers that materialize. */
  final case class Entry(query: String, wallMs: Double, rows: Long,
      tsMillis: Long, planHash: String)

  val schema: StructType = StructType(Seq(
    StructField("query", StringType),
    StructField("wall_ms", DoubleType),
    StructField("rows", LongType),
    StructField("ts", LongType),
    StructField("plan_hash", StringType),
    StructField("run_id", StringType)))

  /** Semantic fingerprint of a DataFrame's optimized logical plan —
    * stable across executions of the same query text/structure,
    * changed by anything that alters the plan (a new filter, a join
    * reorder, a schema change underneath). Catalyst's semanticHash
    * normalizes cosmetic differences (expression ids, aliases), which
    * is exactly the "is this the same query" equivalence a history
    * wants. */
  def planHash(df: DataFrame): String =
    f"${df.queryExecution.optimizedPlan.semanticHash()}%08x"

  /** Execute `df` to completion (count), returning the Entry that
    * records it — the full-fidelity recording path with a real row
    * count. */
  def timed(name: String, df: DataFrame): Entry = {
    val t0 = System.nanoTime()
    val n = df.count()
    val ms = (System.nanoTime() - t0) / 1e6
    Entry(name, ms, n, System.currentTimeMillis(), planHash(df))
  }

  /** Append one batch of entries to the history table under `root`,
    * creating it on first use. Create-if-missing runs under the
    * history table's own lock so two concurrent recorders (two bench
    * JVMs on a shared root) can't both mint the table; the append
    * itself is the ordinary locked insert. */
  def append(spark: SparkSession, root: String, runId: String,
      entries: Seq[Entry]): Unit = {
    if (entries.isEmpty) return
    val cat = new Catalog(spark, root)
    TableLocks.withLock(root, tableName) {
      // attach INSIDE the lock: an attach taken before it would carry a
      // pre-lock table listing, letting two recorders racing a fresh
      // history root both pass the missing check — the loser's
      // createTable (SaveMode.Overwrite) would clobber the winner's
      // just-inserted batch
      cat.attach()
      if (!cat.listTables.contains(tableName))
        cat.createTable(tableName, schema)
      val rows = entries.map(e =>
        Row(e.query, e.wallMs, e.rows, e.tsMillis, e.planHash, runId))
      cat.insertIntoSelect(tableName, spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema))
    }
  }

  /** The history table under `root` (attaching a fresh catalog view of
    * it — history persists across sessions by construction). */
  def history(spark: SparkSession, root: String): DataFrame = {
    val cat = new Catalog(spark, root)
    cat.attach()
    cat.table(tableName)
  }
}
