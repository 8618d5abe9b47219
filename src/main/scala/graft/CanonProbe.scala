package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the full-session fingerprint residual (SCALE.md,
  * round-12 addendum): tests whether a query's `QueryStats.stableString`
  * depends on the ExprId RANGE it was constructed in — the session-
  * history variable a full 318-query Verify run changes and a fresh
  * session doesn't. Constructs the named queries repeatedly, burning a
  * growing block of ExprIds in between (exactly what constructing 300
  * other queries does), and reports any form the canonical string takes
  * besides the first.
  *
  * Usage: scripts/run_class.sh graft.CanonProbe <sfDir> <iters> <names…>
  */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val iters = args.lift(1).map(_.toInt).getOrElse(40)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("f_pseudo_columns")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.tune(spark)
    names.foreach { name =>
      def stable(): String = plans.QueryStats.stableString(
        SparkEntry.queries(name)(spark, sfDir))
      val first = stable()
      var flips = 0
      var firstFlip: Option[(Int, String)] = None
      for (i <- 1 to iters) {
        // burn a growing block of ExprIds — the only session state this
        // probe varies
        (1 to 997 * i).foreach { _ =>
          org.apache.spark.sql.catalyst.expressions.NamedExpression
            .newExprId
        }
        val s = stable()
        if (s != first) {
          flips += 1
          if (firstFlip.isEmpty) firstFlip = Some((i, s))
        }
      }
      println(s"CANONPROBE $name flips=$flips/$iters")
      firstFlip.foreach { case (i, s) =>
        println(s"--- first form ---\n$first")
        println(s"--- flipped form (iter $i) ---\n$s")
      }
    }
    spark.stop()
  }
}
