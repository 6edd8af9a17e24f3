package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch lake layout helpers — the at-rest shape of the reference
  * pipeline (day-partitioned directories consumed by glob,
  * /root/reference/README.md:182), Hive-style so Spark's partition
  * discovery and pruning replace the reference's manual day-glob.
  *
  * Scale: `partitionBy("ingest_date")` keys file layout by day; a
  * reader filtering on `ingest_date` scans ONLY the matching
  * directories (PartitionFilters in the plan — pinned by
  * OperatorSpec's pruning test), the exact analogue of pointing
  * OPENROWSET at one day's path, but planner-driven instead of
  * string-built.
  */
object Lake {

  /** Write `df` day-partitioned by the given timestamp column. */
  def writePartitioned(df: DataFrame, tsCol: String, path: String,
      format: String = "parquet"): Unit =
    df.withColumn("ingest_date", to_date(col(tsCol)))
      .write.partitionBy("ingest_date")
      .format(format).mode("append").save(path)

  /** Read the lake; filters on `ingest_date` prune at planning time. */
  def read(spark: SparkSession, path: String,
      format: String = "parquet"): DataFrame =
    spark.read.format(format).load(path)

  /** One day's slice — directory-pruned, never a full scan. */
  def readDay(spark: SparkSession, path: String, day: String,
      format: String = "parquet"): DataFrame =
    read(spark, path, format).where(col("ingest_date") === lit(day))
}
