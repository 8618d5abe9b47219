package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window function parity (SURVEY §2.5).
  *
  * The reference's WindowFunctionStep materializes input, sorts by
  * (partition, order) and runs one thread per function×partition
  * (reference: dbcon/joblist/windowfunctionstep.cpp:562-594,861;
  * utils/windowfunction/ 4,078 LoC). Spark's WindowExec does the same
  * partition-sort-evaluate, distributed by partition key — the shuffle is on
  * the partitionBy column, so at 100 TB the operator scales with partition
  * cardinality (all queries below partition on keys with ~|customers| or
  * more distinct values; no single-partition global windows except the
  * deliberately tiny ntile demo).
  */
object WindowQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** ROW_NUMBER / RANK / DENSE_RANK / PERCENT_RANK / CUME_DIST
    * (reference: utils/windowfunction/wf_row_number.cpp, wf_ranking.cpp). */
  val ranking: QueryDef = QueryDef(
    "w_ranking",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") < 300)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          percent_rank().over(w).as("prk"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_custkey, o_orderkey,
             row_number() OVER w AS rn,
             rank() OVER w AS rk,
             dense_rank() OVER w AS drk,
             percent_rank() OVER w AS prk,
             cume_dist() OVER w AS cd
      FROM orders WHERE o_custkey < 300
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""")
  )

  /** RANK with real ties (ORDER BY a low-cardinality key). */
  val rankTies: QueryDef = QueryDef(
    "w_rank_ties",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderpriority"))
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },
    oracle = Some("""
      SELECT DISTINCT o_orderstatus, o_orderpriority,
             rank() OVER w AS rk,
             dense_rank() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderpriority)
      ORDER BY o_orderstatus, o_orderpriority""")
  )

  /** Aggregates over ROWS frames: running / sliding / centered
    * (reference: frameboundrow.cpp; ROWS N PRECEDING/FOLLOWING). */
  val rowsFrames: QueryDef = QueryDef(
    "w_rows_frames",
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 20)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_sum"),
          avg(col("l_quantity")).over(w.rowsBetween(-2, 0)).as("avg3"),
          min(col("l_quantity")).over(w.rowsBetween(-1, 1)).as("min3c"),
          max(col("l_quantity"))
            .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
            .as("max_rest"),
          count(lit(1)).over(w.rowsBetween(-2, 2)).as("cnt5"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },
    oracle = Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_sum,
             avg(l_quantity) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3,
             min(l_quantity) OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS min3c,
             max(l_quantity) OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS max_rest,
             count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS cnt5
      FROM lineitem WHERE l_suppkey < 20
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber)
      ORDER BY l_suppkey, l_orderkey, l_linenumber""")
  )

  /** RANGE frames: peers-inclusive running totals + value-based offsets
    * (reference: frameboundrange.cpp; RANGE N PRECEDING). */
  val rangeFrames: QueryDef = QueryDef(
    "w_range_frames",
    (s, dir) => {
      val wTime = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      val wPrice = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      t(s, dir, "orders")
        .filter(col("o_custkey") < 300)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .over(wTime.rangeBetween(Window.unboundedPreceding,
              Window.currentRow)).cast("double").as("running_peers"),
          count(lit(1))
            .over(wPrice.rangeBetween(-50000, 0)).as("cnt_within_50k"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .over(wPrice.rangeBetween(Window.currentRow,
              Window.unboundedFollowing)).cast("double").as("sum_ge"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_peers,
             count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS cnt_within_50k,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS sum_ge
      FROM orders WHERE o_custkey < 300
      ORDER BY o_custkey, o_orderkey""")
  )

  /** LEAD / LAG with offset+default, FIRST/LAST/NTH_VALUE
    * (reference: wf_lead_lag.cpp, wf_nth_value.cpp). */
  val offsets: QueryDef = QueryDef(
    "w_offsets",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 300)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          lead(col("o_orderkey"), 3, 0L).over(w).as("next3_key"),
          first(col("o_totalprice")).over(wf).as("first_price"),
          last(col("o_totalprice")).over(wf).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(wf).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_custkey, o_orderkey,
             lag(o_totalprice, 1) OVER w AS prev_price,
             lag(o_totalprice, 2, -1.0) OVER w AS prev2_price,
             lead(o_totalprice, 1) OVER w AS next_price,
             lead(o_orderkey, 3, 0) OVER w AS next3_key,
             first_value(o_totalprice) OVER wf AS first_price,
             last_value(o_totalprice) OVER wf AS last_price,
             nth_value(o_totalprice, 2) OVER wf AS second_price
      FROM orders WHERE o_custkey < 300
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")
  )

  /** NTILE + windowed plain aggregates without frame
    * (reference: wf_ntile.cpp). */
  val ntileBuckets: QueryDef = QueryDef(
    "w_ntile",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          ntile(10).over(w).as("decile"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_mktsegment, c_custkey,
             ntile(4) OVER w AS quartile,
             ntile(10) OVER w AS decile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, c_custkey""")
  )

  /** PERCENTILE_CONT / PERCENTILE_DISC (WITHIN GROUP) + MEDIAN
    * (reference: wf_percentile.cpp). Grouped aggregate form. */
  val percentiles: QueryDef = QueryDef(
    "w_percentiles",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderstatus,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50_cont,
               percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_cont,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50_disc,
               median(o_totalprice) AS med
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    },
    oracle = Some("""
      SELECT o_orderstatus,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50_cont,
             percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_cont,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50_disc,
             median(o_totalprice) AS med
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  /** COUNT(DISTINCT) over a window partition (reference supports DISTINCT
    * window aggregates, windowfunctiontype.h:62-100; Spark's WindowExec does
    * not) — expressed with the max-dense_rank identity, which is also how
    * a distributed engine avoids per-row distinct state. */
  val distinctOverWindow: QueryDef = QueryDef(
    "w_count_distinct",
    (s, dir) => {
      val wOrd = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_suppkey"))
      val wAll = Window.partitionBy(col("l_orderkey"))
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .withColumn("dr", dense_rank().over(wOrd))
        .select(col("l_orderkey"), col("l_linenumber"),
          max(col("dr")).over(wAll).as("n_distinct_supp"),
          sum(col("l_quantity")).over(wAll).as("order_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    oracle = Some("""
      SELECT l_orderkey, l_linenumber,
             count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_distinct_supp,
             sum(l_quantity) OVER (PARTITION BY l_orderkey) AS order_qty
      FROM lineitem WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber""")
  )

  /** ORDER BY NULLS FIRST/LAST + DESC inside window ordering
    * (reference: utils/windowfunction/idborderby.h nulls handling). */
  val nullsOrdering: QueryDef = QueryDef(
    "w_nulls_ordering",
    (s, dir) => {
      // partitioned by nation: same NULLS FIRST/LAST semantics, but the
      // window parallelizes across partitions instead of collapsing all
      // rows onto one task (|supplier| = 1M at SF100)
      val base = t(s, dir, "supplier")
        .withColumn("balq", nullif((col("s_suppkey") % 4), lit(0)))
      val wNf = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("balq").asc_nulls_first, col("s_suppkey"))
      val wNl = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("balq").desc_nulls_last, col("s_suppkey"))
      base.select(col("s_suppkey"), col("s_nationkey"), col("balq"),
          row_number().over(wNf).as("rn_nulls_first"),
          row_number().over(wNl).as("rn_desc_nulls_last"))
        .orderBy(col("s_suppkey"))
    },
    oracle = Some("""
      SELECT s_suppkey, s_nationkey, nullif(s_suppkey % 4, 0) AS balq,
             row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY nullif(s_suppkey % 4, 0) ASC NULLS FIRST,
                                s_suppkey) AS rn_nulls_first,
             row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY nullif(s_suppkey % 4, 0) DESC NULLS LAST,
                                s_suppkey) AS rn_desc_nulls_last
      FROM supplier ORDER BY s_suppkey""")
  )

  /** LEAD/LAG/FIRST/LAST/NTH_VALUE with IGNORE NULLS (reference:
    * wf_lead_lag.cpp RESPECT|IGNORE NULLS flag; wf_nth_value.cpp). The
    * testdata has no NULLs, so every third price is nulled out first —
    * each output column must skip those rows, not return them. */
  val ignoreNulls: QueryDef = QueryDef(
    "w_ignore_nulls",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf =
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 300)
        .withColumn("price_n",
          when(col("o_orderkey") % 3 === 0, lit(null).cast("double"))
            .otherwise(col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"), col("price_n"),
          lag(col("price_n"), 1, null, ignoreNulls = true).over(w)
            .as("prev_nn"),
          lead(col("price_n"), 1, null, ignoreNulls = true).over(w)
            .as("next_nn"),
          first(col("price_n"), ignoreNulls = true).over(wf).as("first_nn"),
          last(col("price_n"), ignoreNulls = true).over(wf).as("last_nn"),
          nth_value(col("price_n"), 2, ignoreNulls = true).over(wf)
            .as("second_nn"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    oracle = Some("""
      WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
                        CASE WHEN o_orderkey % 3 = 0 THEN NULL
                             ELSE o_totalprice END AS price_n
                 FROM orders WHERE o_custkey < 300)
      SELECT o_custkey, o_orderkey, price_n,
             lag(price_n, 1 IGNORE NULLS) OVER w AS prev_nn,
             lead(price_n, 1 IGNORE NULLS) OVER w AS next_nn,
             first_value(price_n IGNORE NULLS) OVER wf AS first_nn,
             last_value(price_n IGNORE NULLS) OVER wf AS last_nn,
             nth_value(price_n, 2 IGNORE NULLS) OVER wf AS second_nn
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")
  )

  /** Moving EXACT median over a sliding row frame (robust smoother — the
    * windowed dual of the percentile battery; unlike avg it shrugs off
    * the odd 10× outlier row, which is why monitoring pipelines prefer
    * it). Exact median over a 5-row frame; quantities are integral
    * doubles so the even-count midpoint average is exact in both
    * engines. Spark refuses median() with an explicit frame, so the
    * frame's values are collected and the midpoint taken — ≤5 elements
    * per row, constant memory, and the whole expression stays codegen'd
    * (DuckDB's native windowed median is the oracle). */
  val movingMedian: QueryDef = QueryDef(
    "w_moving_median",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_orderkey, l_linenumber, l_quantity,
               CASE WHEN size(vals) % 2 = 1
                    THEN element_at(vals, CAST(size(vals) DIV 2 AS INT) + 1)
                    ELSE (element_at(vals, CAST(size(vals) DIV 2 AS INT))
                          + element_at(vals,
                              CAST(size(vals) DIV 2 AS INT) + 1)) / 2.0
               END AS med5
        FROM (
          SELECT l_orderkey, l_linenumber, l_quantity,
                 sort_array(collect_list(l_quantity) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_orderkey, l_linenumber, l_quantity
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS vals
          FROM lineitem
          WHERE l_orderkey < 2000)
        ORDER BY l_orderkey, l_linenumber""")
    },
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, l_quantity,
             median(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_orderkey, l_linenumber, l_quantity
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
      FROM lineitem
      WHERE l_orderkey < 2000
      ORDER BY l_orderkey, l_linenumber""")
  )

  /** Named WINDOW clause (SQL:2003 `WINDOW w AS (…)`) — one window
    * definition shared by several functions, the declarative form that
    * guarantees a single sort instead of N copy-pasted OVER clauses
    * drifting apart. One SQL text runs unchanged on both engines. */
  val namedWindow: QueryDef = {
    val q = """
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(rank() OVER w AS INTEGER) AS bal_rank,
             CAST(count(*) OVER w AS BIGINT) AS n_at_or_above,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) OVER w
                     AS DOUBLE) / count(*) OVER w, 4) AS running_avg
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC,
                   c_custkey)
      ORDER BY c_mktsegment, bal_rank"""
    QueryDef("w_named_window",
      (s, dir) => { Tables.registerAll(s, dir); s.sql(q) },
      oracle = Some(q))
  }

  def defs: Seq[QueryDef] = Seq(ranking, rankTies, rowsFrames, rangeFrames,
    offsets, ntileBuckets, percentiles, distinctOverWindow, nullsOrdering,
    ignoreNulls, movingMedian, namedWindow)
}
