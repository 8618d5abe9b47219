package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.{GroupConcat, MySqlFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation parity (SURVEY §2.4).
  *
  * The reference runs two-phase hash aggregation — PM partial + UM final
  * (reference: utils/rowgroup/rowaggregation.h:348, tupleaggregatestep.cpp:524,
  * 4100) with COUNT/SUM/AVG/MIN/MAX, STDDEV/VAR (pop/samp), BIT_AND/OR/XOR,
  * GROUP_CONCAT, and per-distinct-column sub-aggregations
  * (RowAggregationMultiDistinct, rowaggregation.h:822). Spark plans the same
  * shape automatically: partial HashAggregate → exchange → final
  * HashAggregate, with distinct aggs expanded per distinct column.
  */
object AggregateQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Core stats: SUM/AVG/MIN/MAX/COUNT + STDDEV/VARIANCE pop+samp.
    * (reference: RowAggFunctionType rowaggregation.h:74-116; long-double
    * variance path calpontsystemcatalog.h LONGDOUBLE) */
  val basicStats: QueryDef = QueryDef(
    "a_basic_stats",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("l_quantity")).as("n_qty"),
          sum(col("l_quantity")).as("sum_qty"),
          avg(col("l_quantity")).as("avg_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"),
          min(col("l_returnflag")).as("min_flag"),
          // variance accumulates in partial-agg order; round to a fixed
          // precision on both sides so the byte-exact gate is deterministic
          round(stddev_pop(col("l_extendedprice")), 4).as("sd_pop"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_samp"),
          round(var_pop(col("l_extendedprice")), 4).as("v_pop"),
          round(var_samp(col("l_extendedprice")), 4).as("v_samp"))
        .orderBy(col("l_returnflag")),
    oracle = Some("""
      SELECT l_returnflag,
             count(*) AS n_rows,
             count(l_quantity) AS n_qty,
             sum(l_quantity) AS sum_qty,
             avg(l_quantity) AS avg_qty,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty,
             min(l_shipdate) AS min_ship,
             max(l_shipdate) AS max_ship,
             min(l_returnflag) AS min_flag,
             round(stddev_pop(l_extendedprice), 4) AS sd_pop,
             round(stddev_samp(l_extendedprice), 4) AS sd_samp,
             round(var_pop(l_extendedprice), 4) AS v_pop,
             round(var_samp(l_extendedprice), 4) AS v_samp
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** DISTINCT aggregates incl. multi-distinct in one SELECT
    * (reference: RowAggregationMultiDistinct rowaggregation.h:822). */
  val distinctAggs: QueryDef = QueryDef(
    "a_distinct_aggs",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          countDistinct(col("l_suppkey")).as("cd_supp"),
          countDistinct(col("l_partkey")).as("cd_part"),
          countDistinct(col("l_returnflag"), col("l_linenumber"))
            .as("cd_multi"),
          sum_distinct(col("l_quantity")).as("sum_d_qty"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_linestatus")),
    oracle = Some("""
      SELECT l_linestatus,
             count(DISTINCT l_suppkey) AS cd_supp,
             count(DISTINCT l_partkey) AS cd_part,
             count(DISTINCT (l_returnflag, l_linenumber)) AS cd_multi,
             sum(DISTINCT l_quantity) AS sum_d_qty,
             avg(l_quantity) AS avg_qty,
             count(*) AS n
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")
  )

  /** BIT_AND / BIT_OR / BIT_XOR (reference: ROWAGG_BIT_AND/OR/XOR,
    * rowaggregation.h:96-98). */
  val bitAggs: QueryDef = QueryDef(
    "a_bit_aggs",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          bit_and(col("l_linenumber")).as("b_and"),
          bit_or(col("l_linenumber")).as("b_or"),
          bit_xor(col("l_linenumber")).as("b_xor"),
          bit_and(col("l_orderkey")).as("b_and_ok"),
          bit_xor(col("l_orderkey")).as("b_xor_ok"))
        .orderBy(col("l_returnflag")),
    oracle = Some("""
      SELECT l_returnflag,
             bit_and(l_linenumber) AS b_and,
             bit_or(l_linenumber) AS b_or,
             bit_xor(l_linenumber) AS b_xor,
             bit_and(l_orderkey) AS b_and_ok,
             bit_xor(l_orderkey) AS b_xor_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** Bivariate statistics battery: CORR / COVAR_POP / COVAR_SAMP plus the
    * linear-regression family (slope / intercept / r²) built from the
    * same moments — parity-plus over the reference's univariate
    * STDDEV/VARIANCE registry (rowaggregation.h:74-116). Both engines
    * compute the regression terms from identical covar/var/avg formulas
    * (not their built-in regr_* aggregates, whose internal numerics may
    * differ), rounded to a fixed precision so partial-agg summation order
    * can't leak into the byte-exact gate. */
  val regression: QueryDef = QueryDef(
    "a_regression",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("r"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4)
            .as("cov_p"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("cov_s"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")) /
            var_pop(col("l_quantity")), 4).as("slope"),
          round(avg(col("l_extendedprice")) -
            covar_pop(col("l_quantity"), col("l_extendedprice")) /
              var_pop(col("l_quantity")) * avg(col("l_quantity")), 4)
            .as("intercept"),
          round(pow(corr(col("l_quantity"), col("l_extendedprice")), 2), 4)
            .as("r2"))
        .orderBy(col("l_returnflag")),
    oracle = Some("""
      SELECT l_returnflag,
             count(*) AS n,
             round(corr(l_quantity, l_extendedprice), 4) AS r,
             round(covar_pop(l_quantity, l_extendedprice), 4) AS cov_p,
             round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
             round(covar_pop(l_quantity, l_extendedprice) /
                   var_pop(l_quantity), 4) AS slope,
             round(avg(l_extendedprice) -
                   covar_pop(l_quantity, l_extendedprice) /
                     var_pop(l_quantity) * avg(l_quantity), 4) AS intercept,
             round(pow(corr(l_quantity, l_extendedprice), 2), 4) AS r2
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** GROUP_CONCAT via the custom ordered Aggregator
    * (reference: dbcon/joblist/groupconcat.cpp — ORDER BY + SEPARATOR +
    * max-len truncation). Customers per nation, ordered by custkey. */
  val groupConcatCustom: QueryDef = QueryDef(
    "a_group_concat",
    (s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_custkey") < 200)
        .groupBy(col("c_nationkey"))
        .agg(GroupConcat.groupConcat(
          lpad(col("c_custkey").cast("string"), 10, "0"), col("c_name"),
          sep = ",", maxLen = 120).as("names"),
          count(lit(1)).as("n"))
        .orderBy(col("c_nationkey")),
    oracle = Some("""
      SELECT c_nationkey,
             left(string_agg(c_name, ',' ORDER BY c_custkey), 120) AS names,
             count(*) AS n
      FROM customer WHERE c_custkey < 200
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  /** GROUP_CONCAT(DISTINCT x ORDER BY x) via built-ins:
    * array_join(array_sort(collect_set)) — the composition path. */
  val groupConcatDistinct: QueryDef = QueryDef(
    "a_group_concat_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), "|")
          .as("statuses"))
        .orderBy(col("l_returnflag")),
    oracle = Some("""
      SELECT l_returnflag,
             string_agg(DISTINCT l_linestatus, '|' ORDER BY l_linestatus)
               AS statuses
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** HAVING post-aggregation filter (reference: TupleHavingStep,
    * dbcon/joblist/tuplehavingstep.h:39). */
  val having: QueryDef = QueryDef(
    "a_having",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")).as("sum_price"))
        .filter(col("n_orders") >= 15 && col("sum_price") > 1000000)
        .orderBy(col("o_custkey")),
    oracle = Some("""
      SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS sum_price
      FROM orders GROUP BY o_custkey
      HAVING count(*) >= 15 AND sum(o_totalprice) > 1000000
      ORDER BY o_custkey""")
  )

  /** ROLLUP — parity-plus: the reference explicitly rejects it
    * (ha_calpont_execplan.cpp:4088 ERR_ROLLUP_NOT_SUPPORT); Spark gives it
    * free, so we surface it. */
  val rollup: QueryDef = QueryDef(
    "a_rollup",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"))
        .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"),
          col("l_linestatus")),
    oracle = Some("""
      SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
             CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
             CAST(grouping(l_linestatus) AS TINYINT) AS g_status
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status, l_returnflag, l_linestatus""")
  )

  /** CUBE (parity-plus, same note as rollup). */
  val cube: QueryDef = QueryDef(
    "a_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), avg(col("o_totalprice")).as("avg_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
    oracle = Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             avg(o_totalprice) AS avg_price
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
  )

  /** Aggregates over empty input: COUNT → 0, SUM/AVG/MIN/MAX → NULL. */
  val emptyInput: QueryDef = QueryDef(
    "a_empty_input",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_totalprice") < -1)
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"),
          avg(col("o_totalprice")).as("a"), min(col("o_totalprice")).as("mn"),
          max(col("o_orderpriority")).as("mx")),
    oracle = Some("""
      SELECT count(*) AS n, sum(o_totalprice) AS s, avg(o_totalprice) AS a,
             min(o_totalprice) AS mn, max(o_orderpriority) AS mx
      FROM orders WHERE o_totalprice < -1""")
  )

  /** High-cardinality two-phase aggregation: group on l_partkey (~20k groups
    * at sf0.1) then re-aggregate the aggregate — the partial/final plan the
    * reference hand-builds (threadedAggregateRowGroups,
    * tupleaggregatestep.cpp:4100) falls out of Catalyst. */
  val highCardinality: QueryDef = QueryDef(
    "a_high_cardinality",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity")).as("part_qty"),
          count(lit(1)).as("part_lines"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("part_qty")).as("total_qty"),
          max(col("part_lines")).as("max_lines"),
          avg(col("part_qty")).as("avg_part_qty")),
    oracle = Some("""
      SELECT count(*) AS n_parts, sum(part_qty) AS total_qty,
             max(part_lines) AS max_lines, avg(part_qty) AS avg_part_qty
      FROM (SELECT l_partkey, sum(l_quantity) AS part_qty,
                   count(*) AS part_lines
            FROM lineitem GROUP BY l_partkey) p""")
  )

  /** MySQL-flavor scalar shims used in aggregation context
    * (reference: func_period.cpp, func_time_to_sec.cpp, func_to_days.cpp). */
  val mysqlShims: QueryDef = QueryDef(
    "fn_mysql_shims",
    (s, dir) => {
      val p = (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long")
      t(s, dir, "orders")
        .select(col("o_orderkey"), p.as("period"),
          MySqlFunctions.periodAdd(p, lit(5)).as("f_period_add"),
          MySqlFunctions.periodDiff(p, lit(199501L)).as("f_period_diff"),
          MySqlFunctions.toDays(col("o_orderdate")).as("f_to_days"),
          MySqlFunctions.fromDays(
            MySqlFunctions.toDays(col("o_orderdate"))).as("f_from_days"),
          MySqlFunctions.timeToSec(col("o_orderdate")).as("f_time_to_sec"),
          MySqlFunctions.secToTime(
            (col("o_orderkey") % 86400).cast("long")).as("f_sec_to_time"))
        .orderBy(col("o_orderkey"))
    },
    oracle = Some("""
      WITH b AS (SELECT o_orderkey,
                        CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS period,
                        CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS months,
                        o_orderdate
                 FROM orders)
      SELECT o_orderkey, period,
             ((months + 5) // 12) * 100 + ((months + 5) % 12) + 1 AS f_period_add,
             months - (1995 * 12 + 1 - 1) AS f_period_diff,
             date_diff('day', DATE '1970-01-01', o_orderdate::DATE) + 719528 AS f_to_days,
             o_orderdate::DATE AS f_from_days,
             CAST(hour(o_orderdate) * 3600 + minute(o_orderdate) * 60
                  + second(o_orderdate) AS BIGINT) AS f_time_to_sec,
             concat(lpad(CAST((o_orderkey % 86400) // 3600 AS VARCHAR), 2, '0'), ':',
                    lpad(CAST(((o_orderkey % 86400) % 3600) // 60 AS VARCHAR), 2, '0'), ':',
                    lpad(CAST((o_orderkey % 86400) % 60 AS VARCHAR), 2, '0')) AS f_sec_to_time
      FROM b ORDER BY o_orderkey""")
  )

  /** Approximate distinct (HLL) — parity-plus: the reference's
    * COUNT(DISTINCT) is always exact (SURVEY §2.4 "no HLL anywhere");
    * at 100 TB the sketch is what you actually run. The oracle checks the
    * exact counts and that the sketch landed within its error bound. */
  val approxDistinct: QueryDef = QueryDef(
    "a_approx_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <
            col("exact_parts") * 0.1).as("within_bounds"))
        .orderBy(col("l_returnflag")),
    oracle = Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             true AS within_bounds
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** LISTAGG (SQL:2023, Spark 4 built-in) — the standard-SQL face of
    * GROUP_CONCAT, exercised through the SQL surface. */
  val listAgg: QueryDef = QueryDef(
    "a_listagg",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
    },
    oracle = Some("""
      SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
  )

  /** Explicit GROUPING SETS (parity-plus; reference rejects all grouping
    * extensions). */
  val groupingSets: QueryDef = QueryDef(
    "a_grouping_sets",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
               CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
               CAST(grouping(l_linestatus) AS TINYINT) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus""")
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
             CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
             CAST(grouping(l_linestatus) AS TINYINT) AS g_status
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                              (l_returnflag, l_linestatus))
      ORDER BY g_flag, g_status, l_returnflag, l_linestatus""")
  )

  /** PIVOT: event counts per type column-wise (the conditional-agg dual —
    * free in Spark, absent from the reference's MySQL 5 surface). */
  val pivot: QueryDef = QueryDef(
    "a_pivot",
    (s, dir) =>
      Tables.table(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day")),
    oracle = Some("""
      SELECT date_trunc('day', ts::TIMESTAMP) AS day,
             count(*) FILTER (WHERE event_type = 'click') AS click,
             count(*) FILTER (WHERE event_type = 'view') AS "view",
             count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             count(*) FILTER (WHERE event_type = 'signup') AS signup,
             count(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY day ORDER BY day""")
  )

  /** Approximate percentile (GK sketch) — parity-plus next to the HLL
    * check: at 100 TB the sketch is what runs (single pass, mergeable
    * state), while exact percentile needs the values collected per group.
    * The oracle checks the exact median and that the sketch landed within
    * a 2% relative band (the sketch itself is merge-order-dependent, so
    * only the bound — not the raw estimate — is hash-compared). */
  val approxPercentile: QueryDef = QueryDef(
    "a_approx_percentile",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("exact_median"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("approx_median"))
        .select(col("l_returnflag"),
          round(col("exact_median"), 4).as("exact_median"),
          (abs(col("approx_median") - col("exact_median")) <
            col("exact_median") * 0.02).as("within_bounds"))
        .orderBy(col("l_returnflag")),
    oracle = Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median,
             true AS within_bounds
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** Per-group top-k through the bounded-buffer TopKLabels aggregate:
    * top-3 customers by balance within each market segment. The buffer
    * never exceeds k pairs (see `functions/TopK.scala`), so the shuffle
    * carries k pairs per (segment, partition) instead of every customer
    * row — the per-group form of the LimitedOrderBy bounded heap. */
  val topkPerGroup: QueryDef = QueryDef(
    "a_topk_per_group",
    (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(graft.functions.TopK
          .topkLabels(col("c_acctbal"), col("c_name"), 3).as("top3"))
        .orderBy(col("c_mktsegment")),
    oracle = Some("""
      SELECT c_mktsegment,
             array_to_string(
               (array_agg(c_name ORDER BY c_acctbal DESC, c_name))[1:3],
               ',') AS top3
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  )

  /** UNPIVOT / melt — the inverse reshape of a_pivot: a wide per-group
    * metrics row unfolds to (group, metric, value) long form, the shape
    * every metrics store and chart pipeline ingests. Sums go through
    * exact decimal before the unfold so both engines emit identical
    * doubles. */
  val unpivot: QueryDef = QueryDef(
    "a_unpivot",
    (s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          sum(col("l_discount").cast("decimal(18,2)")).cast("double")
            .as("sum_disc"))
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    },
    oracle = Some("""
      WITH w AS (
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price,
               CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM w
      UNION ALL
      SELECT l_returnflag, 'sum_disc', sum_disc FROM w
      ORDER BY l_returnflag, metric""")
  )

  /** Higher central moments per group — skewness and excess kurtosis
    * computed from EXACT INTEGER power sums (l_quantity is integral, so
    * Σx..Σx⁴ are exact longs: the largest, Σx⁴ ≈ 50⁴×|rows|, stays far
    * under 2⁵³), then one fixed single-threaded float expression per
    * group. The usual float-skewness pitfall — distributed summation
    * order perturbing the result, and engines disagreeing on
    * population-vs-sample factors — is gone by construction: both
    * engines evaluate the identical population formula from identical
    * integers. Median rides along via interpolated percentile.
    *
    * Scale shape: one two-phase agg (map-side partials of five longs per
    * group); the float math touches |groups| rows only. */
  val moments: QueryDef = QueryDef(
    "a_moments",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"))
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"),
          expr("percentile(x, 0.5d)").as("med"))
        .select(col("l_returnflag"), col("n"),
          round(col("med"), 4).as("median"),
          round(expr("s1 / cast(n as double)"), 4).as("mean"),
          round(expr(
            "(s3/cast(n as double) - 3*(s1/cast(n as double))*(s2/cast(n as double)) + 2*pow(s1/cast(n as double), 3)) / " +
              "pow(s2/cast(n as double) - pow(s1/cast(n as double), 2), 1.5)"),
            4).as("skewness_pop"),
          round(expr(
            "(s4/cast(n as double) - 4*(s1/cast(n as double))*(s3/cast(n as double)) + 6*pow(s1/cast(n as double), 2)*(s2/cast(n as double)) - 3*pow(s1/cast(n as double), 4)) / " +
              "pow(s2/cast(n as double) - pow(s1/cast(n as double), 2), 2) - 3"),
            4).as("kurtosis_excess"))
        .orderBy(col("l_returnflag"))
    },
    oracle = Some("""
      WITH p AS (SELECT l_returnflag, count(*) AS n,
                   sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3,
                   sum(x*x*x*x) AS s4,
                   quantile_cont(x, 0.5) AS med
                 FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
                       FROM lineitem)
                 GROUP BY l_returnflag)
      SELECT l_returnflag, n, round(med, 4) AS median,
             round(s1 / CAST(n AS DOUBLE), 4) AS mean,
             round((s3/CAST(n AS DOUBLE) - 3*(s1/CAST(n AS DOUBLE))*(s2/CAST(n AS DOUBLE)) + 2*pow(s1/CAST(n AS DOUBLE), 3)) /
                   pow(s2/CAST(n AS DOUBLE) - pow(s1/CAST(n AS DOUBLE), 2), 1.5), 4) AS skewness_pop,
             round((s4/CAST(n AS DOUBLE) - 4*(s1/CAST(n AS DOUBLE))*(s3/CAST(n AS DOUBLE)) + 6*pow(s1/CAST(n AS DOUBLE), 2)*(s2/CAST(n AS DOUBLE)) - 3*pow(s1/CAST(n AS DOUBLE), 4)) /
                   pow(s2/CAST(n AS DOUBLE) - pow(s1/CAST(n AS DOUBLE), 2), 2) - 3, 4) AS kurtosis_excess
      FROM p ORDER BY l_returnflag""")
  )

  /** FILTER-clause aggregates (SQL:2003 `agg(...) FILTER (WHERE …)`) —
    * one scan producing several conditionally-restricted aggregates, the
    * declarative form of the CASE-WHEN pivot idiom. One SQL text runs
    * unchanged on both engines. */
  val filterClause: QueryDef = {
    val q = """
      SELECT o_orderstatus,
             count(*) AS n,
             count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
             count(*) FILTER (WHERE year(o_orderdate) = 1997) AS n_1997,
             min(o_totalprice) FILTER (WHERE o_orderpriority LIKE '1%')
               AS min_urgent,
             max(o_totalprice) FILTER (WHERE o_orderpriority LIKE '5%')
               AS max_low
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    QueryDef("a_filter_clause",
      (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) },
      oracle = Some(q))
  }

  /** Exact MODE with a deterministic tie rule — engines disagree on
    * which modal value a bare mode() returns under ties, so the portable
    * form is the explicit count-argmax (count DESC, value ASC), which
    * both engines evaluate identically. One SQL text. */
  val modeAgg: QueryDef = {
    val q = """
      SELECT o_orderstatus, o_orderpriority AS modal_priority, n
      FROM (SELECT o_orderstatus, o_orderpriority,
              count(*) AS n,
              row_number() OVER (PARTITION BY o_orderstatus
                ORDER BY count(*) DESC, o_orderpriority) AS rk
            FROM orders GROUP BY o_orderstatus, o_orderpriority) t
      WHERE rk = 1 ORDER BY o_orderstatus"""
    QueryDef("a_mode",
      (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) },
      oracle = Some(q))
  }

  def defs: Seq[QueryDef] = Seq(basicStats, distinctAggs, bitAggs, regression,
    groupConcatCustom, groupConcatDistinct, having, rollup, cube, emptyInput,
    highCardinality, mysqlShims, approxDistinct, approxPercentile, listAgg,
    groupingSets, pivot, unpivot, topkPerGroup, moments, filterClause,
    modeAgg)
}
