package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Streaming GLOBAL heavy hitters (s31) — the continuous twin of
  * q150's batch Misra–Gries top-k, and the one aggregate shape the
  * per-key state model cannot host: keyed state partitions BY KEY, so
  * no single StatefulProcessor instance ever sees the whole stream —
  * a global summary has to live OUTSIDE the keyed-state machinery.
  *
  * Design (mergeable summaries, Agarwal et al. PODS'12): each
  * micro-batch folds to ONE Misra–Gries sketch row — inside the
  * batch, Spark's partial aggregation runs the sketch per partition
  * executor-side and merges the ≤ k-counter buffers (never the raw
  * rows) up the tree, so the only thing crossing the final exchange
  * is k counters per partition. The per-batch sketch row
  * `(batch, n, keys[], counts[])` appends to a sketch STORE
  * (`batch=<id>` directories, the upsertSink idempotence protocol:
  * a checkpoint-replayed batch finds its directory and skips — the
  * store converges across crashes/restarts). The GLOBAL summary is
  * merge-on-read: fold the stored sketches with the same pairwise MG
  * merge rule the batch aggregator uses, giving the standard
  * guarantees over ALL rows ever streamed (n = Σ batch n):
  *
  *  - every key with true frequency > n/(k+1) is reported;
  *  - reported counts are lower bounds, undercounting by ≤ n/(k+1).
  *
  * Scale: the store grows one ≤ k-entry row per micro-batch (KBs) —
  * reading it is a metadata-sized scan, never data-sized; the fold
  * runs on ≤ batches × k counters (a monitoring read; compact the
  * store by folding old rows into one if batch count ever matters).
  * StreamingSpec pins the guarantees against exact counts on the
  * same replayed rows, across micro-batches AND a restart.
  */
object GlobalSketch {

  /** Per-micro-batch sketch sink: `df`'s `keyCol` (long) is sketched
    * with a k-counter Misra–Gries per batch; one summary row lands in
    * `storePath/batch=<id>` (idempotent on replay). */
  def mgSketchSink(df: DataFrame, keyCol: String, k: Int,
      storePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = new Path(s"$storePath/batch=$batchId")
        val fs = dir.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        if (!fs.exists(dir)) {
          val mg = udaf(new MisraGries(k))
          // one row: n rows seen + the sketch entries (split into
          // parallel arrays — parquet-friendly, order preserved)
          batch.agg(
              count(lit(1)).as("n"),
              mg(col(keyCol).cast("long")).as("sk"))
            .select(col("n"),
              col("sk._1").as("keys"), col("sk._2").as("counts"))
            .coalesce(1)
            .write.mode("errorifexists").parquet(dir.toString)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)

  /** Merge-on-read: fold every stored per-batch sketch with the MG
    * pairwise merge rule into the global top-k summary. Returns
    * (key, cnt) rows sorted (cnt desc, key asc) plus the total row
    * count `n` the n/(k+1) guarantees are stated against — exposed as
    * (key, cnt, n). */
  def globalTopK(spark: SparkSession, storePath: String, k: Int): DataFrame = {
    import spark.implicits._
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty[(Long, Long, Long)].toDF("key", "cnt", "n")
    val sketches = spark.read.option("basePath", storePath)
      .parquet(s"$storePath/batch=*")
      .select(col("n"), col("keys"), col("counts"))
      .collect() // ≤ batches × k counters — metadata-sized by design
    val mg = new MisraGries(k)
    var total = 0L
    var acc: Map[Long, Long] = Map.empty
    sketches.foreach { r =>
      total += r.getLong(0)
      val keys = r.getSeq[Long](1)
      val counts = r.getSeq[Long](2)
      acc = mg.merge(acc, keys.zip(counts).toMap)
    }
    mg.finish(acc).map { case (key, c) => (key, c, total) }
      .toDF("key", "cnt", "n")
  }
}
