package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / distinct parity (SURVEY §2.6).
  *
  * The reference's TupleAnnexStep applies DISTINCT → ORDER BY → LIMIT/OFFSET
  * as the final "annex" (dbcon/joblist/tupleannexstep.h:46); top-k uses a
  * bounded heap of offset+limit rows (limitedorderby.cpp:99-162). Spark
  * plans orderBy+limit as TakeOrderedAndProject — per-partition bounded
  * heaps, merged at the driver: identical algorithm, distributed.
  */
object SortLimitQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  /** Top-k: ORDER BY … LIMIT — must plan as TakeOrderedAndProject. */
  val topK: QueryDef = QueryDef(
    "o_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select(col("o_orderkey"), col("o_totalprice")),
    oracle = Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")
  )

  /** LIMIT with OFFSET (reference: limitStart/limitNum,
    * calpontselectexecutionplan.h:357-361). */
  val limitOffset: QueryDef = QueryDef(
    "o_limit_offset",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(10).limit(15)
        .select(col("o_orderkey"), col("o_totalprice")),
    oracle = Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 15 OFFSET 10""")
  )

  /** Multi-key global sort, mixed ASC/DESC with NULLS FIRST/LAST
    * (reference: idborderby.h CompareRule asc/desc + nulls first/last). */
  val multiKeySort: QueryDef = QueryDef(
    "o_multikey_sort",
    (s, dir) =>
      t(s, dir, "part")
        .withColumn("size_n", nullif(col("p_size"), lit(25)))
        .select(col("p_partkey"), col("p_brand"), col("size_n"))
        .orderBy(col("p_brand").asc, col("size_n").desc_nulls_first,
          col("p_partkey").asc)
        .limit(500),
    oracle = Some("""
      SELECT p_partkey, p_brand, nullif(p_size, 25) AS size_n
      FROM part
      ORDER BY p_brand ASC, nullif(p_size, 25) DESC NULLS FIRST, p_partkey ASC
      LIMIT 500""")
  )

  /** DISTINCT → ORDER BY → LIMIT, the full annex pipeline in one query. */
  val distinctOrderLimit: QueryDef = QueryDef(
    "o_distinct_order_limit",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_linenumber"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"),
          col("l_linenumber"))
        .limit(30),
    oracle = Some("""
      SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber
      FROM lineitem
      ORDER BY l_returnflag, l_linestatus, l_linenumber LIMIT 30""")
  )

  def defs: Seq[QueryDef] = Seq(topK, limitOffset, multiKeySort,
    distinctOrderLimit)
}
