package graft.operators

import graft.sources.Checkpoints.BarrierOps
import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subquery + sort/limit parity (SURVEY §2.6, §2.9).
  *
  * The reference rewrites IN/EXISTS to semi/anti joins, extracts correlated
  * predicates into join filters, and supports scalar subqueries incl.
  * correlated (reference: dbcon/mysql/ha_in_sub.cpp:94-273,
  * dbcon/joblist/jlf_subquery.cpp:196-215,560-685, subquerystep.h:39).
  * Catalyst's RewritePredicateSubquery + decorrelation does all of this;
  * these queries exercise each rewrite through the SQL surface so the
  * optimizer path is the one being tested.
  *
  * Sort/limit: the reference's LimitedOrderBy is a bounded heap of
  * offset+limit rows (dbcon/joblist/limitedorderby.cpp:99-162); Spark's
  * TakeOrderedAndProjectExec is the identical algorithm, distributed
  * (per-partition heaps merged on the driver) — asserted in PlanSpec.
  */
object SubqueryQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q) }

  /** Correlated scalar subquery in the SELECT list
    * (reference: ha_select_sub.cpp). */
  val selectListScalar: QueryDef = {
    val q = """
      SELECT n_nationkey, n_name,
             (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
               AS n_customers,
             (SELECT avg(s_acctbal) FROM supplier WHERE s_nationkey = n_nationkey)
               AS avg_supp_bal
      FROM nation ORDER BY n_nationkey"""
    QueryDef("sub_select_list_scalar", sql(q), oracle = Some(q))
  }

  /** Correlated EXISTS with a compound correlation predicate
    * (reference: ha_exists_sub.cpp, existsfilter.h). */
  val correlatedExists: QueryDef = {
    val q = """
      SELECT c_mktsegment, count(*) AS n
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_totalprice > c_acctbal * 10)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    QueryDef("sub_correlated_exists", sql(q), oracle = Some(q))
  }

  /** Correlated NOT EXISTS. */
  val correlatedNotExists: QueryDef = {
    val q = """
      SELECT c_nationkey, count(*) AS n
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderstatus = 'F')
      GROUP BY c_nationkey ORDER BY c_nationkey"""
    QueryDef("sub_correlated_not_exists", sql(q), oracle = Some(q))
  }

  /** Derived table (FROM-subquery) with aggregation + outer filter pushed
    * into it (reference: ha_from_sub.cpp:45-116 derived-table pruning +
    * filter pushdown — free in Catalyst, asserted in PlanSpec). */
  val derivedTable: QueryDef = {
    val q = """
      SELECT seg, n_orders, total
      FROM (SELECT c_mktsegment AS seg, count(o_orderkey) AS n_orders,
                   sum(o_totalprice) AS total
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment) d
      WHERE n_orders > 100
      ORDER BY seg"""
    QueryDef("sub_derived_table", sql(q), oracle = Some(q))
  }

  /** Correlated scalar compare in WHERE (reference:
    * jlf_subquery.cpp:560 doSimpleScalarFilter). */
  val correlatedScalarWhere: QueryDef = {
    val q = """
      SELECT s_nationkey, count(*) AS n_above
      FROM supplier s1
      WHERE s_acctbal > (SELECT avg(s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s1.s_nationkey)
      GROUP BY s_nationkey ORDER BY s_nationkey"""
    QueryDef("sub_correlated_scalar_where", sql(q), oracle = Some(q))
  }

  /** Uncorrelated IN + HAVING with subquery (reference:
    * jlf_subquery.cpp:676 correlated-in-HAVING path). */
  val havingSubquery: QueryDef = {
    val q = """
      SELECT o_custkey, count(*) AS n_orders
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'MACHINERY')
      GROUP BY o_custkey
      HAVING count(*) > (SELECT avg(cnt) FROM
                          (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey) t)
      ORDER BY o_custkey"""
    QueryDef("sub_having_subquery", sql(q), oracle = Some(q))
  }

  /** CTE / WITH (parity-plus — MySQL 5.x surface has none). The rank in
    * the second CTE is computed as 1 + count of strictly-greater balances
    * via a broadcast theta self-join over the 25-nation domain rather
    * than `rank() OVER (ORDER BY ...)` — identical semantics (ties share
    * a rank), but no unpartitioned window; the DuckDB oracle keeps the
    * window form as the independent derivation. */
  val cte: QueryDef = {
    val q = """
      WITH nation_bal AS (
        SELECT n_nationkey, n_name, sum(c_acctbal) AS bal
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_nationkey, n_name
      ), ranked AS (
        SELECT a.n_nationkey, a.n_name, a.bal,
               1 + count(b.n_nationkey) AS rk
        FROM nation_bal a LEFT JOIN nation_bal b ON b.bal > a.bal
        GROUP BY a.n_nationkey, a.n_name, a.bal
      )
      SELECT n_nationkey, n_name, bal, rk FROM ranked WHERE rk <= 10
      ORDER BY rk, n_nationkey"""
    val o = """
      WITH nation_bal AS (
        SELECT n_nationkey, n_name, sum(c_acctbal) AS bal
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_nationkey, n_name
      ), ranked AS (
        SELECT *, rank() OVER (ORDER BY bal DESC) AS rk FROM nation_bal
      )
      SELECT n_nationkey, n_name, bal, rk FROM ranked WHERE rk <= 10
      ORDER BY rk, n_nationkey"""
    QueryDef("sub_cte", sql(q), oracle = Some(o))
  }

  /** Recursive-CTE surface (parity-plus — the reference's MySQL 5.x front
    * end has no WITH RECURSIVE; modern MySQL/MariaDB do, so a migrating
    * user expects it): transitive closure over a synthetic supplier
    * hierarchy (parent = s_suppkey div 10; node 0 is the sole root).
    * Spark has no recursive CTE, so the closure is computed by POINTER
    * DOUBLING: a pointer table (node → furthest-known ancestor + distance)
    * self-joined k times reaches ancestors 2^k hops away — O(log depth)
    * id-only shuffle rounds instead of the naive O(depth), which is the
    * difference between 4 rounds and a thousand on a deep hierarchy at
    * 100 TB. Four rounds cover depth ≤ 16 (hierarchies to 10^16 keys).
    * The DuckDB oracle replays it with a genuine WITH RECURSIVE. */
  val recursiveClosure: QueryDef = QueryDef(
    "sub_recursive_closure",
    (s, dir) => {
      val supp = Tables.table(s, dir, "supplier")
      var ptr = supp.select(
        col("s_suppkey").as("node"),
        expr("s_suppkey div 10").as("anc"),
        when(expr("s_suppkey div 10") === col("s_suppkey"), lit(0L))
          .otherwise(lit(1L)).as("d"),
        (expr("s_suppkey div 10") === col("s_suppkey")).as("done"))
      for (_ <- 1 to 4) {
        val hop = ptr.select(col("node").as("h_node"),
          col("anc").as("h_anc"), col("d").as("h_d"),
          col("done").as("h_done"))
        ptr = ptr.join(hop, col("anc") === col("h_node"))
          .select(col("node"),
            when(col("done"), col("anc")).otherwise(col("h_anc")).as("anc"),
            when(col("done"), col("d")).otherwise(col("d") + col("h_d"))
              .as("d"),
            when(col("done"), lit(true)).otherwise(col("h_done")).as("done"))
          // materialize each round (same pattern as x_dedup_cc): the lazy
          // tower doubles its own subtree per round — 2^k base scans by
          // round k — while the checkpointed state is 4 longs per node
          .barrier()
      }
      ptr.select(col("node").as("s_suppkey"), col("anc").as("root_key"),
          col("d").as("depth"))
        .orderBy(col("s_suppkey"))
    },
    oracle = Some("""
      WITH RECURSIVE r AS (
        SELECT s_suppkey AS node, s_suppkey AS root_key,
               CAST(0 AS BIGINT) AS depth
        FROM supplier WHERE s_suppkey // 10 = s_suppkey
        UNION ALL
        SELECT s.s_suppkey, r.root_key, r.depth + 1
        FROM supplier s JOIN r ON s.s_suppkey // 10 = r.node
        WHERE s.s_suppkey // 10 <> s.s_suppkey
      )
      SELECT node AS s_suppkey, root_key, depth
      FROM r ORDER BY node""")
  )

  /** Quantified comparisons (> ALL / > ANY / < ALL subqueries — MySQL
    * surface the reference's front end accepts). Spark's parser has no
    * quantified-comparison subquery, so the engine runs the standard
    * desugaring — > ALL(S) ⇔ > max(S), > ANY(S) ⇔ > min(S) on a
    * non-empty non-null S — as scalar subqueries; the DuckDB oracle runs
    * the REAL ALL/ANY syntax, so the rewrite's equivalence is what the
    * gate checks. */
  val anyAll: QueryDef = {
    val rewritten = """
      SELECT
        count(*) AS n_total,
        CAST(sum(CASE WHEN o_totalprice >
            (SELECT max(a) FROM (SELECT avg(o_totalprice) AS a FROM orders
                                 GROUP BY o_orderpriority) t)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_above_all,
        CAST(sum(CASE WHEN o_totalprice >
            (SELECT min(a) FROM (SELECT avg(o_totalprice) AS a FROM orders
                                 GROUP BY o_orderpriority) t)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_above_any,
        CAST(sum(CASE WHEN o_totalprice <
            (SELECT min(a) FROM (SELECT avg(o_totalprice) AS a FROM orders
                                 GROUP BY o_orderpriority) t)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_below_all
      FROM orders"""
    QueryDef("sub_any_all", sql(rewritten), oracle = Some("""
      SELECT
        count(*) AS n_total,
        CAST(sum(CASE WHEN o_totalprice > ALL
            (SELECT avg(o_totalprice) FROM orders GROUP BY o_orderpriority)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_above_all,
        CAST(sum(CASE WHEN o_totalprice > ANY
            (SELECT avg(o_totalprice) FROM orders GROUP BY o_orderpriority)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_above_any,
        CAST(sum(CASE WHEN o_totalprice < ALL
            (SELECT avg(o_totalprice) FROM orders GROUP BY o_orderpriority)
          THEN 1 ELSE 0 END) AS BIGINT) AS n_below_all
      FROM orders"""))
  }

  def defs: Seq[QueryDef] = Seq(selectListScalar, correlatedExists,
    correlatedNotExists, derivedTable, correlatedScalarWhere, havingSubquery,
    cte, recursiveClosure, anyAll)
}
