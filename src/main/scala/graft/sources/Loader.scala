package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Bulk loader — the cpimport equivalent.
  *
  * The reference's cpimport parses delimited text with configurable
  * delimiter / enclosed-by / escape, parallel parse+write buffers, writes
  * extents directly and registers min/max casual-partitioning stats, and
  * diverts malformed rows to .bad reject files
  * (reference: writeengine/bulk/we_bulkload.h:67,199-203,
  * writeengine/bulk/we_bulkloadbuffer.cpp, we_brmreporter.cpp).
  *
  * Spark-first: `spark.read.csv` with an explicit schema is already the
  * parallel parser; Parquet write emits row-group min/max stats (the casual
  * partitioning equivalent); PERMISSIVE mode with a corrupt-record column
  * gives reject handling. Scales to any file count — one task per split.
  */
object Loader {

  case class LoadResult(loaded: Long, rejected: Long, rejects: DataFrame)

  /** Load delimited text into a Parquet table dir, returning counts and the
    * reject rows (cpimport's .bad file as a DataFrame). */
  def loadCsv(
      spark: SparkSession,
      input: String,
      schema: StructType,
      outputPath: String,
      delimiter: String = "|",
      quote: String = "\"",
      escape: String = "\\",
      header: Boolean = false,
      nullValue: String = ""): LoadResult = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType, true))
    val raw = spark.read
      .option("sep", delimiter)
      .option("quote", quote)
      .option("escape", escape)
      .option("header", header.toString)
      .option("nullValue", nullValue)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(input)
    splitGoodBad(spark, raw, outputPath)
  }

  /** Load newline-delimited JSON — the interchange format training-data
    * pipelines actually ship — with the same reject contract as loadCsv:
    * malformed lines divert to the sidecar reject table, good rows land
    * in the parquet table dir. One task per file split, like the CSV
    * path. */
  def loadJsonl(
      spark: SparkSession,
      input: String,
      schema: StructType,
      outputPath: String): LoadResult = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType, true))
    val raw = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .json(input)
    splitGoodBad(spark, raw, outputPath)
  }

  private def splitGoodBad(
      spark: SparkSession, raw: DataFrame, outputPath: String): LoadResult = {
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    // keep data columns alongside the corrupt record: Spark disallows
    // projecting only the internal corrupt-record column
    val bad = raw.filter(col("_corrupt_record").isNotNull)
    good.write.mode(SaveMode.Overwrite).parquet(outputPath)
    // rejects go to a sidecar table (cpimport's .bad file, as parquet);
    // counts come from the two written outputs — no cache of the raw
    // input (at 100 TB caching the whole corpus to count it is a
    // non-starter; two streaming passes over the splits are fine)
    val rejectsPath = outputPath.stripSuffix("/") + "_rejects"
    bad.write.mode(SaveMode.Overwrite).parquet(rejectsPath)
    val loaded = spark.read.parquet(outputPath).count()
    val rejected = spark.read.parquet(rejectsPath).count()
    LoadResult(loaded, rejected, spark.read.parquet(rejectsPath))
  }

  /** Export a DataFrame as delimited text (round-trip support). */
  def exportCsv(df: DataFrame, path: String, delimiter: String = "|",
      header: Boolean = false): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", delimiter).option("header", header.toString)
      .csv(path)

  /** Export a DataFrame as newline-delimited JSON (round-trip support). */
  def exportJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
