package graft

import org.apache.spark.sql.functions._

/** End-to-end sanity over the driver contract at sf0.001. */
class EngineSpec extends GraftSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and matches declared names") {
    val names = SparkEntry.queries.keySet
    assert(names.size == QueryDef.all.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("q01 pricing summary shape and invariants") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 6) // 3 returnflags × 2 linestatus
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty",
      "avg_price", "avg_disc", "count_order"))
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_disc_price")) <=
        r.getDouble(r.fieldIndex("sum_base_price")))
      assert(r.getDouble(r.fieldIndex("sum_charge")) >=
        r.getDouble(r.fieldIndex("sum_disc_price")))
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
    }
  }

  test("q06 equals manual recomputation") {
    val li = Tables.table(spark, sf, "lineitem")
    val manual = li.filter(
      col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount"))).collect()(0)
      .getDouble(0)
    val got = SparkEntry.queries("q06_forecast_revenue")(spark, sf)
      .collect()(0).getDouble(0)
    assert(math.abs(got - manual) < 1e-6)
  }

  test("null-aware NOT IN returns zero when subquery has nulls") {
    val df = SparkEntry.queries("j_anti_null_aware")(spark, sf).collect()(0)
    assert(df.getLong(df.fieldIndex("n_with_nulls")) == 0L)
    assert(df.getLong(df.fieldIndex("n_without_nulls")) == 0L)
    assert(df.getLong(df.fieldIndex("n_plain")) > 0L)
  }

  test("where-false short-circuits to zero") {
    val r = SparkEntry.queries("f_where_false")(spark, sf).collect()(0)
    assert(r.getLong(0) == 0L)
  }
}
