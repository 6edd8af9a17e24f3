package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** s42: streaming DISTRIBUTION-DRIFT monitor — q200's PSI run
  * continuously over a value stream (the "is tonight's ingest still
  * shaped like the corpus" alarm). Each micro-batch lands TWO
  * bins-sized tables, both under the `batch=<id>` idempotence
  * protocol:
  *
  *   hist/batch=<id>/   the batch's dense fixed-grid histogram
  *   drift/batch=<id>/  one row: PSI of this batch against the merged
  *                      histogram of committed batches STRICTLY BELOW
  *                      its id (the s41 prefix rule — a crash-replayed
  *                      batch recomputes the IDENTICAL reference
  *                      regardless of later arrivals, so the drift row
  *                      is exactly-once without state-store help);
  *                      the first batch has no reference → psi NULL
  *
  * The grid (lo/hi/bins) is monitor CONFIG, fixed across batches —
  * the q200/CorpusAudit argument: a data-derived grid re-normalizes
  * away exactly the shift being watched. Add-½ smoothing keeps empty
  * bins finite. Store growth is bins × batches rows; the reference
  * merge reads bins-sized parquet, never the raw stream. */
object DriftMonitor {

  private def committedIdsBelow(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, below: Long): Seq[Path] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filter(p => p.getName.stripPrefix("batch=").toLong < below)
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .toSeq

  private def denseHist(batch: DataFrame, valCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    val s = batch.sparkSession
    val w = (hi - lo) / bins
    val cur = batch.select(least(lit(bins - 1), greatest(lit(0),
        floor((col(valCol) - lo) / w))).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    s.range(bins).select(col("id").cast("int").as("bin"))
      .join(cur, Seq("bin"), "left")
      .na.fill(0L, Seq("cnt"))
  }

  def driftSink(df: DataFrame, valCol: String,
      lo: Double, hi: Double, bins: Int,
      storePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(bins >= 1 && hi > lo, s"bad drift grid: [$lo, $hi) / $bins")
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val conf = s.sparkContext.hadoopConfiguration
        val histRoot = new Path(s"$storePath/hist")
        val histDir = new Path(histRoot, s"batch=$batchId")
        val driftDir = new Path(s"$storePath/drift/batch=$batchId")
        val cur = denseHist(batch, valCol, lo, hi, bins)
        CdcStreams.writeIfUncommitted(_.getFileSystem(conf), conf, histDir) {
          cur.coalesce(1).write.mode("overwrite").parquet(histDir.toString)
        }
        CdcStreams.writeIfUncommitted(_.getFileSystem(conf), conf, driftDir) {
          val fs = histRoot.getFileSystem(conf)
          // reference = batches STRICTLY BELOW this id: replay-stable
          val prev = committedIdsBelow(fs, histRoot, batchId)
          val row =
            if (prev.isEmpty)
              cur.agg(sum("cnt").as("n_cur"))
                .select(lit(null).cast("double").as("psi"),
                  lit(0L).as("n_ref"), col("n_cur"))
            else {
              val ref = s.read.parquet(prev.map(_.toString): _*)
                .groupBy("bin").agg(sum("cnt").as("ref_cnt"))
              val tot = ref.agg(sum("ref_cnt").as("nr"))
                .crossJoin(cur.agg(sum("cnt").as("nc")))
              val rs = (col("ref_cnt") + lit(0.5)) / (col("nr") + lit(bins / 2.0))
              val cs = (col("cur_cnt") + lit(0.5)) / (col("nc") + lit(bins / 2.0))
              cur.select(col("bin"), col("cnt").as("cur_cnt"))
                .join(ref, Seq("bin"), "left")
                .na.fill(0L, Seq("ref_cnt"))
                .crossJoin(broadcast(tot))
                .select(((rs - cs) * log(rs / cs)).as("contrib"),
                  col("nr"), col("nc"))
                .groupBy("nr", "nc")
                .agg(sum("contrib").as("psi"))
                .select(col("psi"), col("nr").as("n_ref"),
                  col("nc").as("n_cur"))
            }
          row.coalesce(1).write.mode("overwrite").parquet(driftDir.toString)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
  }

  /** The monitor's alarm table: (batch_id, psi, n_ref, n_cur) over
    * every committed batch, in batch order. */
  def driftHistory(spark: SparkSession, storePath: String): DataFrame = {
    import spark.implicits._
    val root = new Path(s"$storePath/drift")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = committedIdsBelow(fs, root, Long.MaxValue)
    if (dirs.isEmpty)
      return Seq.empty[(Long, Option[Double], Long, Long)]
        .toDF("batch_id", "psi", "n_ref", "n_cur")
    dirs.map { p =>
      spark.read.parquet(p.toString)
        .withColumn("batch_id", lit(p.getName.stripPrefix("batch=").toLong))
    }.reduce(_ unionByName _)
      .select("batch_id", "psi", "n_ref", "n_cur")
      .orderBy("batch_id")
  }
}
