package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: print ONE JSON line
  * {"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}.
  *
  * Headline queries span every operator family (scan/agg, join snowflake,
  * window, high-cardinality two-phase agg, and the extension dedup/ann/
  * events/text pipelines). Each query executes to completion through the
  * noop sink (full plan runs, nothing materializes driver-side), after a
  * warmup query absorbs JVM/session startup.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q21_suppliers_waiting",
    "j_inner_large",
    "a_high_cardinality",
    "w_rows_frames",
    "o_topk",
    "x_dedup_exact",
    "x_dedup_minhash_lsh",
    "x_ann_brute_topk",
    "x_events_sessionize",
    "x_text_quality")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)

    def run(name: String): Double = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: absorb session startup, file-listing, and first-codegen cost
    // outside the timings — touch every table, then one full query
    try {
      Tables.all.foreach(t => Tables.table(spark, sfDir, t).count())
      run("q06_forecast_revenue")
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }

    // SPARK_GRAFT_BENCH_ALL=1 times every registered query (slow-outlier
    // hunting); default is the headline set the driver records.
    val names =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        SparkEntry.queries.keys.toSeq.sorted
      else headline
    // best-of-N (default 2): the first execution of a plan pays one-time
    // whole-stage-codegen compilation; steady-state is the throughput
    // number comparable to a warmed reference engine
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val results = names.map { name =>
      val sec =
        try (1 to runs).map(_ => run(name)).min
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"headline_total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
