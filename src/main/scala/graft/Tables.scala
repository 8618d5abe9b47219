package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet testdata.
  *
  * Plays the role of the reference's `CalpontSystemCatalog`
  * (reference: dbcon/execplan/calpontsystemcatalog.h:107 — schema.table.column
  * → object IDs → column files). Here a table is simply a parquet path; the
  * columnar layout, dictionary encoding, and min/max block statistics the
  * reference implements by hand (blocksize.h:25, extentmap.h:99) come free
  * from the Parquet format + Spark's vectorized reader.
  *
  * At 100 TB the same code holds: `spark.read.parquet` scales to any number
  * of files/partitions; scan parallelism is governed by
  * `spark.sql.files.maxPartitionBytes`, and partition/row-group pruning is
  * automatic once filters are pushed (verified in PlanSpec).
  */
object Tables {
  val starSchema: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extension: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = starSchema ++ extension

  /** Session defaults we care about regardless of how the driver built the
    * session. Idempotent, runtime-settable confs only. */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // The reference broadcasts join small sides under 64 MB
    // (oam/etc/Calpont.xml:483 PmMaxMemorySmallSide); match that.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
  }

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Read one table. Filters/pruning push down to the parquet scan. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(path(dir, name))
  }

  /** Read every table and register temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    tune(spark)
    all.map { n =>
      val df = spark.read.parquet(path(dir, n))
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
  }
}
