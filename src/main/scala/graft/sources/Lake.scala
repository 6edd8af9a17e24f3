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

  /** Read with parquet schema merging — the CDC lake reality: the
    * upstream table gains columns over time, so different days carry
    * different `after` schemas. Merged reads surface the superset;
    * old files read the new columns as null. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Bucketed table write — co-located joins. Two tables bucketed (and
    * sorted) the same way on their join key join WITHOUT any shuffle:
    * the scan's bucketing satisfies the join's required distribution,
    * so a fact-to-fact join at 100 TB skips both exchanges entirely
    * (pinned by OperatorSpec's no-Exchange plan test). Bucketed layout
    * is the write-once analogue of `repartition` — pay the shuffle at
    * ingest, never again per query. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Compact one day-partition's small files into ~`targetBytes`
    * outputs. Changefeed sinks write a file per flush — at scale a day
    * directory accumulates tens of thousands of tiny files and every
    * scan pays per-file open cost. Output file count is derived from
    * the optimizer's size stats (no data collect).
    *
    * Swap protocol (directory renames are not transactional without a
    * table format — Delta/Iceberg jars are absent in this build, see
    * NOTES): stage the rewrite into `_compact_tmp_<day>`, rename the
    * live day ASIDE, rename tmp into place, delete the aside. Data is
    * never destroyed before the replacement is live: a crash strands
    * at worst one extra complete copy, and the next call restores the
    * aside automatically. A concurrent reader can still observe the
    * day briefly missing between the two renames — that visibility
    * gap is inherent to glob-over-directories; eliminating it needs a
    * manifest-based table format. */
  def compactDay(spark: SparkSession, path: String, day: String,
      targetBytes: Long = 128L << 20): Unit = {
    import org.apache.hadoop.fs.Path
    val dayDir = new Path(s"$path/ingest_date=$day")
    val tmpDir = new Path(s"$path/_compact_tmp_$day")
    val asideDir = new Path(s"$path/_compact_old_$day")
    val fs = dayDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery: a previous attempt that died between renames
    // left the live day aside — put it back before doing anything
    if (!fs.exists(dayDir) && fs.exists(asideDir)) fs.rename(asideDir, dayDir)
    fs.delete(tmpDir, true)
    fs.delete(asideDir, true)
    if (!fs.exists(dayDir)) return
    val slice = spark.read.parquet(dayDir.toString)
    val bytes = slice.queryExecution.optimizedPlan.stats.sizeInBytes
    val nOut = math.max(1L, ((bytes + targetBytes - 1) / targetBytes).toLong).toInt
    slice.repartition(nOut).write.mode("overwrite").parquet(tmpDir.toString)
    if (!fs.rename(dayDir, asideDir))
      throw new java.io.IOException(s"compact aside rename failed: $dayDir")
    if (!fs.rename(tmpDir, dayDir)) {
      fs.rename(asideDir, dayDir) // roll back — old data stays live
      throw new java.io.IOException(s"compact rename failed: $tmpDir -> $dayDir")
    }
    fs.delete(asideDir, true)
  }
}
