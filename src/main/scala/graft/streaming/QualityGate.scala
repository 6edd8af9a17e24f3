package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** s43: streaming EXPECTATIONS gate — q194's declared-rule audit
  * applied AT INGEST, the streaming sibling of `Lake.mergeIntoChecked`
  * (which gates merges) and the dead-letter split (s29, which gates
  * on event time): every micro-batch splits three ways, each landing
  * under the `batch=<id>` idempotence protocol:
  *
  *   data/batch=<id>/        rows violating NO rule (the clean feed)
  *   quarantine/batch=<id>/  violating rows + the `bad_rules` array
  *                           naming every rule that caught them (a
  *                           row quarantines ONCE however many rules
  *                           it fails — no duplication)
  *   metrics/batch=<id>/     one row per rule: violation count over
  *                           the batch total (q194's one-scan
  *                           sum(CASE) fold — rule count never
  *                           multiplies batch scans)
  *
  * Quarantined rows are kept whole, so a fixed rule set can replay
  * them later (the s29 contract); the metrics store is the alarm
  * feed a monitor tails. Crash-replay of a batch re-lands the
  * identical three tables (`_SUCCESS`-guarded, rule evaluation is
  * deterministic per row), so the gate is exactly-once end to end. */
object QualityGate {

  def gateSink(df: DataFrame, rules: Seq[(String, Column)],
      storePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(rules.nonEmpty, "gateSink needs at least one rule")
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val conf = s.sparkContext.hadoopConfiguration
        val fs = (p: Path) => p.getFileSystem(conf)
        // every rule evaluated once per row, into one array column
        val badRules = array_compact(array(rules.map { case (rid, bad) =>
          when(bad, lit(rid)).otherwise(lit(null).cast("string")) }: _*))
        val tagged = batch.withColumn("bad_rules", badRules)
        val dataDir = new Path(s"$storePath/data/batch=$batchId")
        CdcStreams.writeIfUncommitted(fs, conf, dataDir) {
          tagged.where(size(col("bad_rules")) === 0).drop("bad_rules")
            .coalesce(1).write.mode("overwrite").parquet(dataDir.toString)
        }
        val qDir = new Path(s"$storePath/quarantine/batch=$batchId")
        CdcStreams.writeIfUncommitted(fs, conf, qDir) {
          tagged.where(size(col("bad_rules")) > 0)
            .coalesce(1).write.mode("overwrite").parquet(qDir.toString)
        }
        val mDir = new Path(s"$storePath/metrics/batch=$batchId")
        CdcStreams.writeIfUncommitted(fs, conf, mDir) {
          val aggs = rules.zipWithIndex.map { case ((_, bad), i) =>
            sum(when(bad, lit(1L)).otherwise(lit(0L))).as(s"v$i") }
          val stackArgs = rules.zipWithIndex
            .map { case ((rid, _), i) => s"'$rid', v$i" }.mkString(", ")
          batch.agg(count(lit(1)).as("n"), aggs: _*)
            .selectExpr(s"stack(${rules.size}, $stackArgs) AS (rule_id, n_viol)",
              "n AS n_checked")
            .select(col("rule_id"), col("n_checked"), col("n_viol"))
            .coalesce(1).write.mode("overwrite").parquet(mDir.toString)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
  }

  private def committed(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[Path] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .toSeq

  private def readAll(spark: SparkSession, root: String,
      withBatchId: Boolean = false): Option[DataFrame] = {
    val r = new Path(root)
    val fs = r.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = committed(fs, r)
    if (dirs.isEmpty) None
    else if (!withBatchId)
      Some(spark.read.parquet(dirs.map(_.toString): _*))
    else Some(dirs.map { p =>
      spark.read.parquet(p.toString)
        .withColumn("batch_id", lit(p.getName.stripPrefix("batch=").toLong))
    }.reduce(_ unionByName _))
  }

  /** The clean feed over all committed batches. */
  def gated(spark: SparkSession, storePath: String): Option[DataFrame] =
    readAll(spark, s"$storePath/data")

  /** Quarantined rows (with `bad_rules`) over all committed batches. */
  def quarantined(spark: SparkSession, storePath: String): Option[DataFrame] =
    readAll(spark, s"$storePath/quarantine")

  /** Per-(batch, rule) violation metrics, the monitor's alarm feed. */
  def metrics(spark: SparkSession, storePath: String): Option[DataFrame] =
    readAll(spark, s"$storePath/metrics", withBatchId = true)
}
