package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.UnionNormalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operation parity (SURVEY §2.7).
  *
  * The reference supports UNION / UNION ALL only, N-ary, with cross-leg type
  * normalization and hash-based dedup (reference: dbcon/joblist/tupleunion.h:47,
  * :96 normalize, :123-138 Hasher/uniquer). INTERSECT/EXCEPT are parity-plus
  * (free in Spark). Dedup (`distinct`) is a hash aggregate — shuffles on the
  * full row, which is the scalable plan at any size.
  */
object SetOpQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** UNION ALL of customer and supplier legs. */
  val unionAll: QueryDef = QueryDef(
    "s_union_all",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"),
          col("c_acctbal").as("acctbal"), lit("cust").as("side"))
      val p = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey"),
          col("s_acctbal").as("acctbal"), lit("supp").as("side"))
      c.union(p)
        .groupBy(col("nationkey"), col("side"))
        .agg(count(lit(1)).as("n"), sum(col("acctbal")).as("sum_bal"))
        .orderBy(col("nationkey"), col("side"))
    },
    oracle = Some("""
      SELECT nationkey, side, count(*) AS n, sum(acctbal) AS sum_bal
      FROM (SELECT c_nationkey AS nationkey, c_acctbal AS acctbal,
                   'cust' AS side FROM customer
            UNION ALL
            SELECT s_nationkey, s_acctbal, 'supp' FROM supplier) u
      GROUP BY nationkey, side ORDER BY nationkey, side""")
  )

  /** UNION (distinct) with overlapping legs — hash dedup
    * (reference: tupleunion.h:123 uniquer). */
  val unionDistinct: QueryDef = QueryDef(
    "s_union_distinct",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("k"))
      c.union(p).distinct().orderBy(col("k"))
    },
    oracle = Some("""
      SELECT c_nationkey AS k FROM customer
      UNION
      SELECT s_nationkey FROM supplier
      ORDER BY k""")
  )

  /** N-ary UNION with type normalization across legs — bigint, int, double
    * and decimal legs promote like the reference's normalize()
    * (tupleunion.cpp promotion lattice). */
  val unionTypeNorm: QueryDef = QueryDef(
    "s_union_type_norm",
    (s, dir) => {
      val legs = Seq(
        t(s, dir, "customer").select(col("c_custkey").as("v"))
          .filter(col("c_custkey") < 10), // bigint
        t(s, dir, "nation").select(col("n_nationkey").as("v"))
          .filter(col("n_nationkey") < 10), // int
        t(s, dir, "supplier").select(col("s_acctbal").as("v"))
          .filter(col("s_suppkey") < 10), // double
        t(s, dir, "part").select(col("p_retailprice").cast("decimal(12,2)")
          .as("v")).filter(col("p_partkey") < 10)) // decimal
      UnionNormalize.unionNormalized(legs)
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    },
    oracle = Some("""
      SELECT count(*) AS n, sum(v) AS sum_v, min(v) AS min_v, max(v) AS max_v
      FROM (SELECT c_custkey AS v FROM customer WHERE c_custkey < 10
            UNION ALL
            SELECT n_nationkey FROM nation WHERE n_nationkey < 10
            UNION ALL
            SELECT s_acctbal FROM supplier WHERE s_suppkey < 10
            UNION ALL
            SELECT CAST(p_retailprice AS DECIMAL(12,2)) FROM part
            WHERE p_partkey < 10) u""")
  )

  /** INTERSECT (parity-plus; distinct semantics). */
  val intersectDistinct: QueryDef = QueryDef(
    "s_intersect",
    (s, dir) => {
      val c = t(s, dir, "customer").select((col("c_custkey") % 150).as("k"))
      val p = t(s, dir, "supplier").select(col("s_suppkey").as("k"))
      c.intersect(p).orderBy(col("k"))
    },
    oracle = Some("""
      SELECT c_custkey % 150 AS k FROM customer
      INTERSECT
      SELECT s_suppkey FROM supplier
      ORDER BY k""")
  )

  /** EXCEPT (parity-plus; distinct semantics). */
  val exceptDistinct: QueryDef = QueryDef(
    "s_except",
    (s, dir) => {
      val c = t(s, dir, "nation").select(col("n_nationkey").as("k"))
      val p = t(s, dir, "supplier").select((col("s_suppkey") % 12).as("k"))
      c.except(p).orderBy(col("k"))
    },
    oracle = Some("""
      SELECT n_nationkey AS k FROM nation
      EXCEPT
      SELECT s_suppkey % 12 FROM supplier
      ORDER BY k""")
  )

  /** EXCEPT ALL / INTERSECT ALL — multiset semantics (parity-plus). */
  val allVariants: QueryDef = QueryDef(
    "s_except_intersect_all",
    (s, dir) => {
      val a = t(s, dir, "lineitem").select(col("l_linenumber").as("k"))
      val b = t(s, dir, "orders")
        .select((col("o_orderkey") % 5 + 1).cast("int").as("k"))
      val ea = a.exceptAll(b).groupBy(col("k"))
        .agg(count(lit(1)).as("n_except_all"))
      val ia = a.intersectAll(b).groupBy(col("k"))
        .agg(count(lit(1)).as("n_intersect_all"))
      ea.join(ia, Seq("k"), "full_outer")
        .select(col("k"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"))
        .orderBy(col("k"))
    },
    oracle = Some("""
      WITH a AS (SELECT l_linenumber AS k FROM lineitem),
           b AS (SELECT CAST(o_orderkey % 5 + 1 AS INTEGER) AS k FROM orders),
           ea AS (SELECT k, count(*) AS n_except_all
                  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
                  GROUP BY k),
           ia AS (SELECT k, count(*) AS n_intersect_all
                  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
                  GROUP BY k)
      SELECT coalesce(ea.k, ia.k) AS k,
             coalesce(n_except_all, 0) AS n_except_all,
             coalesce(n_intersect_all, 0) AS n_intersect_all
      FROM ea FULL OUTER JOIN ia ON ea.k = ia.k
      ORDER BY k""")
  )

  def defs: Seq[QueryDef] = Seq(unionAll, unionDistinct, unionTypeNorm,
    intersectDistinct, exceptDistinct, allVariants)
}
