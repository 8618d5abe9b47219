package graft.plans

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Registers graft's custom Catalyst expressions as SQL functions, so they
  * are usable from spark.sql text, inside higher-order-function lambdas
  * (transform/filter), and from any session surface.
  *
  * Two registration paths:
  *  - `GraftExtensions` for `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the SparkSessionExtensions route, like any Spark extension library);
  *  - `registerAll(spark)` for an existing session (what Tables.tune uses,
  *    since the driver builds the session itself).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.functions", name),
          builder))
    }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (es => SimHash64(es.head)),
    "hamming64" -> (es => Hamming64(es(0), es(1))),
    "fingerprint64" -> (es => Fingerprint64(es.head)),
    "minhash_sig" -> (es => MinHashSig(es(0), intArg(es(1), "k"))),
    "cosine_sim" -> (es => CosineSim(es(0), es(1))),
    "dot_product" -> (es => DotProduct(es(0), es(1))),
    "l2_distance" -> (es => L2Distance(es(0), es(1))),
    "lsh_bucket" -> (es => LshBucket(es(0), intArg(es(1), "planes"),
      longArg(es(2), "seed")))
  )

  /** Idempotent registration on a live session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
