package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming surface of the engine (SURVEY.md §2.9) — the
  * continuous twin of the reference pipeline: CockroachDB changefeed →
  * ndjson files in a lake container → consumer
  * (/root/reference/README.md:128-138,182).
  *
  * The reference's delivery contract is at-least-once with per-key
  * ordering by the `updated` HLC timestamp (README.md:90,137); these
  * helpers upgrade that to exactly-once analytics the Spark way:
  * checkpointed offsets + idempotent batch sinks + watermarked
  * dedup/upsert state.
  *
  * Scale: file-source listing is incremental (maxFilesPerTrigger
  * bounds a micro-batch); all stateful ops key on the envelope key or
  * event id, so state partitions across executors and is pruned by
  * watermark — nothing here holds unbounded state.
  */
object CdcStreams {

  /** Shared idempotence guard for `batch=<id>` directory writes (the
    * upsert store and every GlobalSketch sink). A directory counts as
    * COMMITTED only with its `_SUCCESS` marker — the committer creates
    * the dir at job SETUP, so a bare dir-exists test lets a replayed
    * batch skip a crash-truncated write and silently lose its rows;
    * an uncommitted leftover is deleted and rewritten here.
    *
    * Safety valve: when `_SUCCESS` markers are DISABLED
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false` — some
    * object-store deployments), the marker test would judge a
    * perfectly committed dir "uncommitted" and destroy it (a folded
    * compaction dir would lose ALL history) — so with markers off the
    * guard degrades to the dir-exists rule, trading the truncated-dir
    * recovery for never destroying committed data. */
  private[graft] def writeIfUncommitted(
      fs: Path => org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      dir: Path)(write: => Unit): Unit = {
    val f = fs(dir)
    val markers =
      conf.getBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
    if (markers) {
      if (!f.exists(new Path(dir, "_SUCCESS"))) {
        f.delete(dir, true)
        write
      }
    } else if (!f.exists(dir)) write
  }

  /** The wrapped changefeed envelope: `{after: {...row}, key: [...],
    * updated: "<hlc>"}` (README.md:135-138,178; FIXTURES.md §2).
    * `after` is null for deletes. */
  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("after", rowSchema, nullable = true),
    StructField("key", ArrayType(StringType), nullable = true),
    StructField("updated", StringType, nullable = true)))

  /** s01: continuous tail of a growing ndjson directory — the
    * streaming form of the reference's day-glob `BULK ... 2022-12-12`
    * ndjson snapshot scan (README.md:182). */
  def readEnvelopeStream(spark: SparkSession, dir: String,
      rowSchema: StructType, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(envelopeSchema(rowSchema))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Batch twin of s01 — the reference's actual consumption mode: an
    * ad-hoc scan of one day's envelope files by glob (README.md:182,
    * the day-directory star-dot-ndjson pattern). Globs work as-is; no
    * sentinel delimiter trick is needed because the json reader is
    * line-native (vs the reference's 0x0b FIELDQUOTE workaround,
    * README.md:183-187). */
  def readEnvelopeBatch(spark: SparkSession, pathOrGlob: String,
      rowSchema: StructType): DataFrame =
    spark.read.schema(envelopeSchema(rowSchema)).json(pathOrGlob)

  /** Raw-line variant — the literal shape of the reference's
    * `WITH (line varchar(max))` scan (README.md:188-190): each line
    * kept whole in a `line` column, envelope fields parsed per
    * expression with from_json. Use when malformed lines must be
    * retained for quarantine instead of nulled by the json reader. */
  def readEnvelopeLines(spark: SparkSession, pathOrGlob: String,
      rowSchema: StructType): DataFrame =
    spark.read.text(pathOrGlob)
      .withColumnRenamed("value", "line")
      .withColumn("env", from_json(col("line"), envelopeSchema(rowSchema)))

  /** Streaming twin of `readEnvelopeLines` — the raw-line quarantine
    * scan under `readStream`: a malformed line survives as a row with
    * `env IS NULL` (line retained for quarantine) instead of being
    * silently nulled field-by-field by the json source. */
  def readEnvelopeLinesStream(spark: SparkSession, dir: String,
      rowSchema: StructType, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .withColumnRenamed("value", "line")
      .withColumn("env", from_json(col("line"), envelopeSchema(rowSchema)))

  private val lineOnly = StructType(Seq(StructField("line", StringType)))
  // Sentinel delimiter/quote chars that cannot occur in JSON text, so
  // the csv reader never splits inside an envelope — the Spark twin of
  // the reference's FIELDQUOTE = 0x0b workaround (README.md:183-187).
  private val sentinelSep = "\u0001"
  private val sentinelQuote = "\u000b"

  /** CSV-format envelope scan — the reference's sentinel-delimiter
    * trick (README.md:183-190): a CSV reader with out-of-band
    * delimiter/quote characters lands each ndjson line whole in one
    * varchar field, parsed per-expression with from_json. Same
    * quarantine contract as `readEnvelopeLines`. */
  def readEnvelopeCsv(spark: SparkSession, pathOrGlob: String,
      rowSchema: StructType): DataFrame =
    spark.read
      .schema(lineOnly)
      .option("sep", sentinelSep).option("quote", sentinelQuote)
      .csv(pathOrGlob)
      .withColumn("env", from_json(col("line"), envelopeSchema(rowSchema)))

  /** Streaming twin of `readEnvelopeCsv`. */
  def readEnvelopeCsvStream(spark: SparkSession, dir: String,
      rowSchema: StructType, maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(lineOnly)
      .option("sep", sentinelSep).option("quote", sentinelQuote)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)
      .withColumn("env", from_json(col("line"), envelopeSchema(rowSchema)))

  /** Flatten post-images; deletes surface as `is_delete` tombstones. */
  def postImages(envelopes: DataFrame): DataFrame =
    envelopes.select(
      col("after.*"),
      col("key"), col("updated"),
      col("after").isNull.as("is_delete"))

  /** s02: day-partitioned append sink with checkpointed exactly-once
    * (the lake layout of README.md:182, written back out). */
  def writePartitionedSink(df: DataFrame, tsCol: String, path: String,
      checkpoint: String): StreamingQuery =
    df.withColumn("ingest_date", to_date(col(tsCol)))
      .writeStream.format("parquet")
      .partitionBy("ingest_date")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** s06: at-least-once → effectively-once. Watermark bounds the dedup
    * state: ids older than the watermark are dropped from the store. */
  def dedupStream(df: DataFrame, idCol: String, tsCol: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark).dropDuplicates(idCol)

  /** Late-data DEAD-LETTER split — the operational pattern every
    * watermarked pipeline needs and Spark doesn't surface: a row older
    * than the watermark is silently DROPPED by windowed aggregates /
    * dedup / stateful operators (s03 pins the drop; the engine even
    * pre-filters late rows from a stateful operator's INPUT, so no
    * in-plan operator can observe them). An ingestion pipeline wants
    * those rows in a quarantine for replay/audit, not gone — so the
    * split happens at the SINK, on the un-watermarked stream, against
    * a watermark tracked by the engine's own update rule:
    * wm(batch N) = max event time over batches < N, minus the delay —
    * including the one-batch lag, so the routing agrees exactly with
    * what a parallel watermarked query would have dropped (s29 pins
    * the agreement against the s03 semantics).
    *
    * Restart caveat (documented, inherent to sink-side tracking): the
    * engine restores ITS watermark from the checkpoint, this tracker
    * restarts at -∞ — after a restart, previously-late rows in the
    * first replayed batch route on-time once. For exactly-once sinks
    * the replayed batch id makes the write idempotent anyway; callers
    * needing the strict engine value across restarts should persist
    * `maxSeenMs` beside their sink state. Rows with NULL event time
    * route to the `late` (dead-letter) sink in every batch — the same
    * rows a watermarked stateful operator silently drops — so every
    * input row lands in exactly one sink.
    *
    * Scale: the split is two map-side filters per micro-batch plus one
    * max aggregate; the batch is persisted once so the three passes
    * share the scan. */
  def lateSplitSink(df: DataFrame, tsCol: String, delayMs: Long,
      onTime: (DataFrame, Long) => Unit,
      late: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    val maxSeenMs = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val wmMs =
        if (maxSeenMs.get == Long.MinValue) Long.MinValue
        else maxSeenMs.get - delayMs
      val b = batch.persist()
      try {
        val tsMs = (col(tsCol).cast("double") * 1000).cast("long")
        // NULL event time routes to the dead-letter side in EVERY
        // batch: a watermarked stateful operator drops such rows (the
        // watermark predicate evaluates to null → filtered), and a
        // null comparison must not strand the row in neither sink.
        val isLate = tsMs.isNull ||
          (lit(wmMs != Long.MinValue) && tsMs < wmMs)
        late(b.where(isLate), batchId)
        onTime(b.where(!isLate), batchId)
        // watermark stats come from ALL rows flowing through the
        // watermark node — late ones included — exactly like
        // EventTimeWatermarkExec
        val mx = b.agg(max(tsMs)).head()
        if (!mx.isNullAt(0)) {
          maxSeenMs.getAndUpdate(m => math.max(m, mx.getLong(0)))
          ()
        }
      } finally { b.unpersist(); () }
      ()
    }
  }

  /** Batch/`foreachBatch` upsert core — latest record per key
    * (q61 semantics): one shuffle by key, rank-1 filter. When
    * `isDelete` is given, a WINNING tombstone removes its key from the
    * state entirely — CRDB changefeeds emit deletes as `after: null`
    * envelopes (README.md:135-138) and the movr workload runs DELETEs
    * (README.md:140), so a consumer that merely surfaces the tombstone
    * as "latest state" would resurrect deleted keys. Replay-order
    * semantics: latest record wins; if it is a delete the key is gone,
    * and an UPSERT newer than the delete re-creates it (rank-1 over
    * the full record sequence gives exactly that). */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], isDelete: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val latest = df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    isDelete.fold(latest)(d => latest.where(!d))
  }

  /** s07: exactly-once upsert sink. Each micro-batch lands in a
    * `batch=<id>` directory; a restart that replays a batch id finds
    * the directory and skips — write idempotence on top of the
    * checkpoint's offset replay. `currentState` materializes the
    * upsert view (latest per key across batches). */
  def upsertSink(df: DataFrame, statePath: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = new Path(s"$statePath/batch=$batchId")
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        writeIfUncommitted(_.getFileSystem(conf), conf, dir) {
          batch.write.mode("overwrite").parquet(dir.toString)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)

  def currentState(spark: SparkSession, statePath: String,
      keyCols: Seq[String], orderCols: Seq[String],
      isDelete: Option[Column] = None): DataFrame =
    latestByKey(spark.read.option("basePath", statePath)
      .parquet(s"$statePath/batch=*"), keyCols, orderCols, isDelete)

  /** Streaming MERGE sink — each micro-batch merges into a DIRECTLY
    * queryable parquet table (`Lake.mergeInto`: matched-update /
    * not-matched-insert / tombstone-delete, physical deletes), the
    * MERGE INTO consumption mode a lake user reaches for, vs
    * `upsertSink`'s append-only `batch=<id>` store that needs a
    * rank-1 `currentState` read and periodic compaction. Exactly-once
    * across restarts WITHOUT tracking batch ids: the merge conflict
    * rule is the CDC replay rule (latest by `orderCols` wins), so a
    * checkpoint-replayed micro-batch merges to the identical state —
    * idempotence by semantics, not by bookkeeping.
    *
    * Routing: with `partitionCol` set (e.g. `ingest_date`, present on
    * the stream), each micro-batch merges ONLY the partitions it
    * touches (`Lake.mergeIntoPartitioned`) — a minute-cadence batch
    * spanning one day rewrites one directory, never the table; this
    * is the form to run at lake scale. Without it, every batch pays a
    * copy-on-write of the whole `targetDir` (then point it at a
    * single day partition, or prefer `upsertSink` + compaction
    * cadence when batches are small and frequent — all trades
    * documented, all tested). A crash mid-batch replays the batch and
    * re-merges idempotently per partition. */
  def mergeSink(df: DataFrame, targetDir: String, checkpoint: String,
      keyCols: Seq[String], orderCols: Seq[String],
      isDeleteCol: Option[String] = None,
      partitionCol: Option[String] = None,
      changeDir: Option[String] = None,
      cdfPreImages: Boolean = false): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        partitionCol match {
          case Some(pc) =>
            graft.sources.Lake.mergeIntoPartitioned(batch.sparkSession,
              targetDir, batch, pc, keyCols, orderCols, isDeleteCol.map(col),
              changeDir, cdfPreImages)
            ()
          case None =>
            graft.sources.Lake.mergeInto(batch.sparkSession, targetDir, batch,
              keyCols, orderCols, isDeleteCol.map(col), changeDir, cdfPreImages)
        }
      }
      .option("checkpointLocation", checkpoint)

  /** Follow a MERGE change feed as a stream — the downstream half of
    * `mergeSink(changeDir = …)` / `Lake.mergeInto(changeDir)`: each
    * published `merge=<k>` directory surfaces as new files, so an
    * incremental consumer (sync a cache, feed a search index, drive a
    * downstream aggregate) reads row-level effects with the file
    * source's own exactly-once checkpointing — no snapshot diffing.
    * `rowSchema` is the merged table's post-image schema; `_op` is
    * appended here. The glob re-lists per micro-batch, so merges
    * published after the stream starts are picked up.
    *
    * Set `partitioned = true` when the PRODUCER routes per partition
    * (`mergeSink(partitionCol=…)` / `mergeIntoPartitioned` /
    * `LakeOps.runNightly`) — that feed nests one level deeper
    * (`changeDir/<partCol>=<v>/merge=<k>`), and the flat glob would
    * match nothing, silently, forever. */
  def readChangeFeedStream(spark: SparkSession, changeDir: String,
      rowSchema: StructType, maxFilesPerTrigger: Int = 16,
      partitioned: Boolean = false): DataFrame = {
    val glob =
      if (partitioned) s"$changeDir/*/merge=*" else s"$changeDir/merge=*"
    spark.readStream
      .schema(rowSchema.add("_op", StringType))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(glob)
  }

  /** Compact the upsert store: fold every `batch=N` directory into one
    * directory holding the materialized current state. The store
    * otherwise grows with every micro-batch and each `currentState`
    * read re-ranks all history; compaction also PHYSICALLY removes
    * tombstoned keys (the delete actually deletes — retention/GDPR).
    *
    * Safe against the sink's replay protocol: the consolidated
    * directory keeps the HIGHEST seen batch id, and a restarted stream
    * can only replay that id (found → skipped) or continue at id+1 —
    * older ids are committed in the checkpoint and never replay.
    *
    * The discovered `batch` partition column is DROPPED before the
    * rewrite: the consolidated files must carry the same physical
    * schema as the files later sink batches write, or the store's
    * footers drift apart and re-reads depend on schema-overlap
    * resolution.
    *
    * Swap protocol (same as Lake.compactDay): stage to a temp dir,
    * rename the live `batch=<maxId>` aside, rename tmp into place,
    * THEN delete the aside and the older batch dirs. No step destroys
    * data before its replacement is live: a crash after the swap
    * leaves consolidated + older dirs coexisting, which `currentState`
    * still ranks correctly (the consolidated rows are copies of each
    * key's winner, so rank-1 picks the same record), and the next call
    * finishes the cleanup. A crash between the renames is restored
    * from the aside at the next call. */
  def compactState(spark: SparkSession, statePath: String,
      keyCols: Seq[String], orderCols: Seq[String],
      isDelete: Option[Column] = None): Unit = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val tmp = new Path(s"$statePath/_compact_tmp")
    // crash recovery: restore a stranded aside before reading state
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("_compact_old_")).foreach { aside =>
        val target = new Path(root, s"batch=${aside.getName.stripPrefix("_compact_old_")}")
        if (!fs.exists(target)) fs.rename(aside, target)
        else fs.delete(aside, true)
      }
    fs.delete(tmp, true)
    val batchDirs = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).toSeq
    if (batchDirs.size < 2) return
    val maxId = batchDirs.map(_.getName.stripPrefix("batch=").toLong).max
    currentState(spark, statePath, keyCols, orderCols, isDelete)
      .drop("batch")
      .write.mode("overwrite").parquet(tmp.toString)
    val target = new Path(s"$statePath/batch=$maxId")
    val aside = new Path(s"$statePath/_compact_old_$maxId")
    if (!fs.rename(target, aside))
      throw new java.io.IOException(s"state compaction aside rename failed at $statePath")
    if (!fs.rename(tmp, target)) {
      fs.rename(aside, target) // roll back — old state stays live
      throw new java.io.IOException(s"state compaction rename failed at $statePath")
    }
    fs.delete(aside, true)
    batchDirs.filterNot(_.getName == s"batch=$maxId").foreach(fs.delete(_, true))
  }
}
