package graft.examples

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Lake, Snapshot}

/** Incremental SCD TYPE-2 history maintenance from a merge change
  * feed — the warehouse-dimension consumer of the CDC lake: where
  * [[IncrementalView]] keeps an aggregate fresh and
  * [[IncrementalIndex]] keeps a postings table fresh, this keeps the
  * FULL VERSION HISTORY of every key — `[valid_from, valid_to)`
  * validity stamped in MERGE IDS — so "what did the row look like
  * as of merge k" ([[asOf]]) is answerable forever without replaying
  * the feed. q117/q136 derive SCD2 from a complete event log in one
  * shot; this is the continuous form, maintained diff-by-diff.
  *
  * Fold rule per feed entry `merge=<k>` (entries fold ONE AT A TIME —
  * `valid_from` IS the entry id, so per-entry granularity is the
  * semantics, not a limitation; same discipline as the view's max
  * path):
  *
  *   insert            → open a version (valid_from=k, current)
  *   update_preimage   → close the key's current version (valid_to=k)
  *   update_postimage  → open the replacement version
  *   delete            → close the current version, open nothing
  *
  * A merge diff carries each key at most once, so "close then open"
  * within one entry is unambiguous. The history is append-mostly:
  * each fold touches exactly the entry's keys — implemented as one
  * key-keyed join of the history against the entry's (bounded)
  * closer-key set plus a union of the opened rows, then committed as
  * the next snapshot version (atomic pointer rename, `_applied_upto`
  * marker riding the commit — the exactly-once argument is
  * IncrementalView's, verbatim).
  *
  * Scale: the fold rewrites the history store (copy-on-write, the
  * same cost class as `Lake.mergeInto` itself); at 100 TB the history
  * would be hash-partitioned by key (each partition folds its slice
  * of the diff independently — the `mergeIntoPartitioned` shape) or
  * partitioned by `valid_from` range so old, closed versions are
  * never rewritten. The closer-key set is one merge diff — KBs–MBs —
  * and broadcasts.
  */
object IncrementalScd2 {

  private def appliedUpto(fs: FileSystem, store: Path): Long =
    Snapshot.resolve(fs, store).getOrElse(Nil).flatMap { member =>
      fs.listStatus(member).map(_.getPath.getName)
        .filter(_.startsWith("_applied_upto_"))
        .map(_.stripPrefix("_applied_upto_").toLong)
    }.foldLeft(-1L)(math.max)

  /** Fold every unapplied feed entry into the history store; returns
    * the new applied-upto id. `attrCols` names the feed columns kept
    * as dimension attributes (key columns excluded). */
  def refresh(spark: SparkSession, histDir: String, changeDir: String,
      keyCols: Seq[String], attrCols: Seq[String]): Long = {
    val store = new Path(histDir)
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending =
      IncrementalView.pendingFeedIds(spark, histDir, changeDir)
    if (pending.isEmpty) return appliedUpto(fs, store)
    pending.foreach(k => applyEntry(spark, store, changeDir, k,
      keyCols, attrCols))
    pending.max
  }

  private def applyEntry(spark: SparkSession, store: Path,
      changeDir: String, k: Long, keyCols: Seq[String],
      attrCols: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = store.getFileSystem(conf)
    val entry = spark.read.parquet(s"$changeDir/merge=$k")
    val badOp = entry.select("_op").where(!col("_op").isin(
      "insert", "update_preimage", "update_postimage", "delete"))
    require(badOp.isEmpty,
      "IncrementalScd2: feed entry without pre-images — publish the " +
        "feed with cdfPreImages = true")
    val opens = entry
      .where(col("_op").isin("insert", "update_postimage"))
      .select(keyCols.map(col) ++ attrCols.map(col): _*)
      .withColumn("valid_from", lit(k))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val closers = entry
      .where(col("_op").isin("update_preimage", "delete"))
      .select(keyCols.map(c => col(c).as(s"__c_$c")): _*)
      .distinct()
      .withColumn("__close", lit(true))
    val next =
      if (Snapshot.currentVersion(fs, store).isEmpty) opens
      else {
        val hist = Lake.readStore(spark, store.toString)
        val cond = keyCols.map(c => col(c) <=> col(s"__c_$c"))
          .reduce(_ && _)
        // the closer set is one merge diff's keys — broadcast by
        // construction; only is_current rows of those keys change
        hist.join(broadcast(closers), cond, "left")
          .withColumn("valid_to",
            when(col("is_current") && col("__close") === true, lit(k))
              .otherwise(col("valid_to")))
          .withColumn("is_current",
            col("is_current") && col("__close").isNull)
          .drop((keyCols.map(c => s"__c_$c") :+ "__close"): _*)
          .unionByName(opens)
      }
    val stageName = Snapshot.stageDirName(fs, store, "scd2")
    val staged = Snapshot.stagePath(store, stageName)
    next.write.mode("overwrite").parquet(staged.toString)
    val marker = new Path(staged, s"_applied_upto_$k")
    val out = fs.create(marker, true); out.close()
    Snapshot.commit(fs, conf, store, Seq(stageName))
    Snapshot.vacuum(fs, store, keep = 2)
  }

  /** The full history (keyCols…, attrCols…, valid_from, valid_to,
    * is_current). */
  def read(spark: SparkSession, histDir: String): DataFrame =
    Lake.readStore(spark, histDir)

  /** Point-in-time read: each key's version visible AS OF merge id
    * `v` — the state just after `merge=<v>` folded (closed lower
    * bound, open upper: valid_from ≤ v < valid_to). */
  def asOf(spark: SparkSession, histDir: String, v: Long): DataFrame =
    read(spark, histDir)
      .where(col("valid_from") <= v &&
        (col("valid_to").isNull || col("valid_to") > v))
      .drop("valid_to", "is_current")
}
