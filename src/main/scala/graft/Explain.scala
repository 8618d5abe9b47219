package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted plan (and post-AQE executed
  * plan) for the named queries. Usage:
  *   scripts/run_class.sh graft.Explain <sfDir> q01_pricing_summary …
  *   scripts/run_class.sh graft.Explain <sfDir> --canon <names…>
  * `--canon` prints the CANONICALIZED optimized plan — the exact string
  * `QueryStats.planHash` fingerprints — without executing: the
  * diagnostic for "why did this query's plan_hash move between runs"
  * (diff two sessions' dumps to find the unstable token).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val canon = args.lift(1).contains("--canon")
    val rest = args.drop(if (canon) 2 else 1).toSeq
    val names = if (rest.nonEmpty) rest else Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    if (canon) {
      names.foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        // print the stableString, not the raw canonicalized form: the
        // hash is reproducible from the printed text, and diffing two
        // sessions' dumps surfaces ONLY hash-relevant differences
        // (identity tokens and commutative order are already folded)
        println(s"\n===== $name (stable canonical; hash=${
          plans.QueryStats.planHash(df)}) =====")
        println(plans.QueryStats.stableString(df))
      }
      spark.stop()
      return
    }
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n===== $name (formatted, pre-execution) =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      df.write.mode("overwrite").format("noop").save()
      println(s"===== $name (executed, post-AQE) =====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
