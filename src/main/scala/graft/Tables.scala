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

  private val tuned = java.util.Collections.synchronizedSet(
    new java.util.HashSet[org.apache.spark.sql.SparkSession]())

  /** Session defaults we care about regardless of how the driver built the
    * session. Idempotent, runtime-settable confs only; applied once per
    * session (table() calls this on every read). */
  def tune(spark: SparkSession): Unit = {
    if (!tuned.add(spark)) return
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // The reference broadcasts join small sides under 64 MB
    // (oam/etc/Calpont.xml:483 PmMaxMemorySmallSide); match that.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    // rejects; read as long and convert (see table()).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    plans.GraftExtensions.registerAll(spark)
  }

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Read one table. Filters/pruning push down to the parquet scan. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    val df = spark.read.parquet(path(dir, name))
    // Normalize the event timestamp to TIMESTAMP (ltz) whatever the file
    // carries. Generations of the testdata have shipped TIMESTAMP(NANOS)
    // (arrives as long under nanosAsLong; `div 1000` floors to µs exactly —
    // a double division would lose precision above 2^53) and plain
    // timestamp[us] with no timezone (arrives as TIMESTAMP_NTZ under
    // Spark 4's inferTimestampNTZ). With the session pinned to UTC the
    // NTZ→LTZ cast maps the same wall-clock instant, so downstream
    // unix_micros()/window() calls see one stable type either way.
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType ==
          org.apache.spark.sql.types.LongType =>
        d.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case (d, f) if f.name == "ts" && f.dataType ==
          org.apache.spark.sql.types.TimestampNTZType =>
        d.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case (d, _) => d
    }
  }

  /** Read every table and register temp views so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    tune(spark)
    all.map { n =>
      val df = table(spark, dir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
  }

  /** registerAll + attach a persisted catalog dir: catalog tables and
    * persisted CREATE VIEW definitions re-register into this session
    * (the reference's views survive reconnects the same way —
    * dbcon/mysql/ha_view.cpp resolves them from stored definitions). */
  def registerAll(spark: SparkSession, dir: String,
      catalogRoot: String): Map[String, DataFrame] = {
    val base = registerAll(spark, dir)
    new sources.Catalog(spark, catalogRoot).attach()
    base
  }
}
