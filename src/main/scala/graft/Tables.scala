package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-supplied star schema
  * (`TESTDATA.md:13-16`). Every query reads ONLY through here, so
  * filter/projection pushdown reaches the parquet scan uniformly.
  *
  * Scale note: `spark.read.parquet` uses the vectorized columnar
  * reader; on a real cluster the same call distributes file splits
  * across executors — nothing here is local-mode specific.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.ts` arrived as parquet TIMESTAMP(NANOS) in early fixture
    * drops, which Spark's reader rejects outright
    * (PARQUET_TYPE_ILLEGAL); later drops use TIMESTAMP(MICROS), which
    * reads natively. Handle both: the nanosAsLong legacy conf
    * (SPARK-40819) surfaces a NANOS column as a raw epoch-ns long,
    * which we floor-convert to a microsecond TimestampType — integer
    * `div`, not `/`, because an epoch-ns value (~1.7e18) exceeds
    * double's 2^53 exact range. A MICROS column already reads as
    * TimestampType and passes through untouched. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Fan a scan out to all cores before CPU-heavy per-row work.
    *
    * A parquet file is splittable only at row-group boundaries, so a
    * small single-row-group file scans as ONE partition and every
    * downstream map-side expression (md5 fan-outs, JSON round-trips,
    * shingling) runs on one core until the first shuffle. On a real
    * cluster a 100 TB table arrives as thousands of splits and this is
    * a no-op (guarded on the actual scan partition count); on the
    * bench fixtures it buys full parallelism for the price of
    * shuffling a few MB of raw rows. Use it ONLY in front of
    * expression-heavy pipelines — plain scan→shuffle queries gain
    * nothing from an extra exchange.
    */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    // Estimate the scan's split count from the optimizer's size stats
    // (file bytes — already cached from the read-time listing) using
    // Spark's own split formula (FilePartition.maxSplitBytes with the
    // default 128 MB maxPartitionBytes / 4 MB openCostInBytes), instead
    // of probing df.rdd.getNumPartitions — that probe forced a full
    // physical planning of every spread query on the driver.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val perCore = (bytes / target).max(1).toLong
    val maxSplit = math.min(128L << 20, math.max(4L << 20, perCore))
    val estSplits = (bytes + maxSplit - 1) / maxSplit
    if (estSplits < target) df.repartition(target) else df
  }
}
