package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ADAPTIVE temperature sampling (s41) — continuous
  * mixture balancing under corpus drift: each micro-batch is sampled
  * with per-stratum cuts derived from the stream's OWN history so
  * far (q176's (min/cnt)^(1−α) rule over accumulated counts), so as
  * the observed mix drifts, the keep-rates follow — without any
  * global pass over the stream.
  *
  * Replay-determinism is the design constraint: a batch's cuts
  * derive ONLY from count batches with id STRICTLY BELOW its own
  * (`batch=<id>` store, one listing), so a crash-replayed batch
  * recomputes the identical cuts no matter what later batches landed
  * meanwhile. Both stores are idempotent `batch=<id>` +
  * `_SUCCESS`-guarded (CdcStreams.writeIfUncommitted): a committed
  * sample batch is NEVER recomputed, so its cuts are never needed
  * again. The first batch (no history) keeps everything, as does any
  * stratum unseen in history — a new language is counted before it
  * is ever damped. The counts store is stratum-sized per batch
  * (KBs); a production run would fold count batches below the
  * committed-sample watermark (ids a replay can still need stay
  * unfolded) — at fixture scale the unfolded store is already
  * metadata-sized, so the fold is deliberately out of scope here.
  */
object AdaptiveSample {

  private def committedIdsBelow(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, below: Long): Seq[Path] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter(p => p.getName.stripPrefix("batch=").toLong < below)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .toSeq

  /** The per-batch sink: land this batch's per-stratum counts, then
    * its sample filtered by history-derived cuts. */
  def temperatureSink(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double, countsDir: String, sampleDir: String,
      checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val conf = s.sparkContext.hadoopConfiguration
        val cRoot = new Path(countsDir)
        val fs = cRoot.getFileSystem(conf)
        CdcStreams.writeIfUncommitted(_.getFileSystem(conf), conf,
          new Path(s"$countsDir/batch=$batchId")) {
          batch.groupBy(col(strataCol))
            .agg(count(lit(1)).as("cnt"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$countsDir/batch=$batchId")
        }
        CdcStreams.writeIfUncommitted(_.getFileSystem(conf), conf,
          new Path(s"$sampleDir/batch=$batchId")) {
          val prev = committedIdsBelow(fs, cRoot, batchId)
          val kept =
            if (prev.isEmpty) batch // no history: keep everything
            else {
              val hist = s.read.parquet(prev.map(_.toString): _*)
                .groupBy(col(strataCol)).agg(sum("cnt").as("__cnt"))
              val minc = hist.agg(min("__cnt").as("__min"))
              val cuts = hist.crossJoin(broadcast(minc))
                .withColumn("__cut",
                  floor(pow(col("__min").cast("double") / col("__cnt"),
                    1.0 - alpha) * 10000).cast("long"))
                .select(col(strataCol), col("__cut"))
              batch.join(broadcast(cuts), Seq(strataCol), "left")
                .where(graft.operators.TextDedup.hashDraw(idCol, "adapt") <
                  coalesce(col("__cut"), lit(10000L)))
                .drop("__cut")
            }
          kept.coalesce(1).write.mode("overwrite")
            .parquet(s"$sampleDir/batch=$batchId")
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
  }

  /** All sampled rows so far (committed batches only). Before any
    * batch commits the sample's schema is unknowable from the store,
    * so pass `schema` (the streamed frame's schema) to get a typed
    * empty result a downstream `select` can still project — a
    * zero-column `emptyDataFrame` would throw AnalysisException on
    * the first column reference. Omitting it keeps the old behavior
    * for callers that check `isEmpty` first. */
  def readSample(spark: SparkSession, sampleDir: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val root = new Path(sampleDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = committedIdsBelow(fs, root, Long.MaxValue)
    if (dirs.isEmpty)
      schema.map(sc => spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], sc))
        .getOrElse(spark.emptyDataFrame)
    else
      spark.read.option("mergeSchema", "true")
        .parquet(dirs.map(_.toString): _*)
  }
}
