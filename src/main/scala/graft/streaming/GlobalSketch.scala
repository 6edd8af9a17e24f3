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


  /** The batch directories a reader should consume: a compacted store
    * carries a `_folded_upto_<k>` marker INSIDE `batch=<k>` (the
    * marker travels atomically with the fold's swap rename), meaning
    * every dir with id < k is already included in that row — so those
    * dirs are dead weight awaiting cleanup, and reading them would
    * DOUBLE-COUNT after a crash that died between the fold's swap and
    * its deletions.
    *
    * A stranded `_compact_old_<k>` aside whose `batch=<k>` target is
    * MISSING stands in for that id: compaction died (or is right now)
    * between its two renames, and the aside holds the live pre-fold
    * copy of `batch=<k>` — without it the reader would silently drop
    * that slice of history until the next compact* call restores the
    * aside (round-7 ADVICE). The rule also closes the transient
    * read gap DURING a healthy compaction: between the aside rename
    * and the tmp rename a reader sees the aside (old store); once the
    * target is live the aside is ignored (new store) — a reader
    * always observes one complete snapshot, never a missing dir. */
  private def liveBatchDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Seq[Path] = {
    val all = fs.listStatus(root).map(_.getPath).toSeq
    val batchDirs = all.filter(_.getName.startsWith("batch="))
    val batchIds =
      batchDirs.map(_.getName.stripPrefix("batch=").toLong).toSet
    val standIns = all.filter(_.getName.startsWith("_compact_old_"))
      .filter(a =>
        !batchIds.contains(a.getName.stripPrefix("_compact_old_").toLong))
    val dirs = batchDirs ++ standIns
    def idOf(p: Path): Long = {
      val n = p.getName
      if (n.startsWith("batch=")) n.stripPrefix("batch=").toLong
      else n.stripPrefix("_compact_old_").toLong
    }
    val foldedUpTo = dirs.flatMap { d =>
      fs.listStatus(d).map(_.getPath.getName)
        .filter(_.startsWith("_folded_upto_"))
        .map(_.stripPrefix("_folded_upto_").toLong)
    }.foldLeft(-1L)(math.max)
    dirs.filter(idOf(_) >= foldedUpTo)
  }

  /** Per-micro-batch sketch sink: `df`'s `keyCol` (long) is sketched
    * with a k-counter Misra–Gries per batch; one summary row lands in
    * `storePath/batch=<id>` (idempotent on replay — committed dirs
    * skip, a crash-truncated dir rewrites). */
  def mgSketchSink(df: DataFrame, keyCol: String, k: Int,
      storePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = new Path(s"$storePath/batch=$batchId")
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        CdcStreams.writeIfUncommitted(_.getFileSystem(conf), conf, dir) {
          val mg = udaf(new MisraGries(k))
          // one row: n rows seen + the sketch entries (split into
          // parallel arrays — parquet-friendly, order preserved)
          batch.agg(
              count(lit(1)).as("n"),
              mg(col(keyCol).cast("long")).as("sk"))
            .select(col("n"),
              col("sk._1").as("keys"), col("sk._2").as("counts"))
            .coalesce(1)
            .write.mode("overwrite").parquet(dir.toString)
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
    val live = liveBatchDirs(fs, root)
    if (live.isEmpty) return Seq.empty[(Long, Long, Long)].toDF("key", "cnt", "n")
    val sketches = spark.read // explicit dir roots, no basePath: no partition inference (a
      // _compact_old_ stand-in is not name=value and must not conflict)
      .parquet(live.map(_.toString): _*)
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

  /** The shared marker-swap compaction protocol (compactSketches /
    * compactHistogram differ ONLY in their fold): restore any stranded
    * aside, complete any interrupted cleanup (dirs a marker already
    * supersedes), run `fold(liveDirs, tmpDir)` to stage the folded
    * rows, stamp the `_folded_upto_<maxId>` marker INSIDE tmp (it
    * rides the swap rename atomically), aside-swap into
    * `batch=<maxId>`, then delete the superseded dirs. One
    * implementation so the two stores' crash behavior can never
    * silently diverge. */
  private def compactStore(spark: SparkSession, storePath: String)(
      fold: (Seq[Path], Path) => Unit): Unit = {
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    // crash recovery: restore a stranded aside before reading
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("_compact_old_")).foreach { aside =>
        val target = new Path(root,
          s"batch=${aside.getName.stripPrefix("_compact_old_")}")
        if (!fs.exists(target)) fs.rename(aside, target)
        else fs.delete(aside, true)
      }
    val tmp = new Path(s"$storePath/_compact_tmp")
    fs.delete(tmp, true)
    // complete any interrupted cleanup. Deletions are derived from the
    // MARKER RULE over ONE listing — delete exactly the dirs whose id
    // is strictly below the highest `_folded_upto_` value (round-7
    // ADVICE): a sink committing `batch=<id>` concurrently always
    // carries an id ABOVE every marker (markers are stamped at the
    // then-max id, and committed lower ids never replay), so this set
    // is closed under concurrent arrivals — unlike a
    // `filterNot(live.contains)` against an earlier listing, which
    // would delete a batch that landed between the two listings and
    // silently lose its rows forever.
    val listed = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).toSeq
    val foldedUpTo = listed.flatMap { d =>
      fs.listStatus(d).map(_.getPath.getName)
        .filter(_.startsWith("_folded_upto_"))
        .map(_.stripPrefix("_folded_upto_").toLong)
    }.foldLeft(-1L)(math.max)
    listed.filter(_.getName.stripPrefix("batch=").toLong < foldedUpTo)
      .foreach(fs.delete(_, true))
    val live =
      listed.filter(_.getName.stripPrefix("batch=").toLong >= foldedUpTo)
    if (live.size < 2) return
    val maxId = live.map(_.getName.stripPrefix("batch=").toLong).max
    fold(live, tmp)
    // the marker rides inside tmp so the swap rename publishes data
    // and supersession in ONE atomic step
    fs.create(new Path(tmp, s"_folded_upto_$maxId"), true).close()
    val target = new Path(s"$storePath/batch=$maxId")
    val aside = new Path(s"$storePath/_compact_old_$maxId")
    if (!fs.rename(target, aside))
      throw new java.io.IOException(
        s"sketch-store compaction aside rename failed at $storePath")
    if (!fs.rename(tmp, target)) {
      fs.rename(aside, target) // roll back - old store stays live
      throw new java.io.IOException(
        s"sketch-store compaction rename failed at $storePath")
    }
    fs.delete(aside, true)
    live.filterNot(_.getName == s"batch=$maxId").foreach(fs.delete(_, true))
  }

  /** Bound MG-store growth: fold every stored per-batch sketch row
    * into ONE row living in the HIGHEST seen `batch=` directory — the
    * same replay-safe id choice as `CdcStreams.compactState` (a
    * restarted stream can only replay that id, found-committed →
    * skipped, or continue at id+1; older ids are committed offsets and
    * never replay).
    *
    * Unlike compactState's rank-1 store — where a crash-stranded extra
    * copy is harmless (rank-1 picks the same winner) — sketch counts
    * are ADDITIVE: a folded row coexisting with the dirs it folded
    * would double-count. So the folded row carries a
    * `_folded_upto_<maxId>` marker file that travels ATOMICALLY with
    * the swap rename, and every reader (`liveBatchDirs`) ignores dirs
    * below the highest marker. Crash windows: before the swap —
    * nothing live changed; after the swap, before the deletions — the
    * marker already supersedes the old dirs (readers correct, the next
    * call completes the cleanup); between the two renames — the
    * standard aside restore. The global summary is IDENTICAL before
    * and after (the fold is the same pairwise merge `globalTopK` runs
    * — spec-pinned, including the mid-cleanup crash). */
  def compactSketches(spark: SparkSession, storePath: String, k: Int): Unit =
    compactStore(spark, storePath) { (live, tmp) =>
      import spark.implicits._
      val rows = spark.read // explicit dir roots, no basePath: no partition inference (a
      // _compact_old_ stand-in is not name=value and must not conflict)
        .parquet(live.map(_.toString): _*)
        .select(col("n"), col("keys"), col("counts")).collect()
      val mg = new MisraGries(k)
      var total = 0L
      var acc: Map[Long, Long] = Map.empty
      rows.foreach { r =>
        total += r.getLong(0)
        acc = mg.merge(acc, r.getSeq[Long](1).zip(r.getSeq[Long](2)).toMap)
      }
      val folded = mg.finish(acc)
      Seq((total, folded.map(_._1), folded.map(_._2)))
        .toDF("n", "keys", "counts")
        .coalesce(1).write.parquet(tmp.toString)
    }

  /** Bound histogram-store growth — `compactSketches`' sibling for the
    * s33 store, SIMPLER fold (bin counts just add: a distributed
    * `groupBy(bin).sum`, no driver state), same atomic-marker swap
    * protocol: the folded rows land in `batch=<maxId>` with a
    * `_folded_upto_<maxId>` marker riding the rename, readers ignore
    * superseded dirs, the next call completes any interrupted
    * cleanup. Estimates identical before and after (spec-pinned). */
  def compactHistogram(spark: SparkSession, storePath: String): Unit =
    compactStore(spark, storePath) { (live, tmp) =>
      spark.read // explicit dir roots, no basePath: no partition inference (a
      // _compact_old_ stand-in is not name=value and must not conflict)
        .parquet(live.map(_.toString): _*)
        .groupBy("bin").agg(sum("cnt").as("cnt"))
        .coalesce(1).write.parquet(tmp.toString)
    }

  /** Streaming GLOBAL quantiles (s33) — the quantile twin of the MG
    * top-k, same store-outside-state design, SIMPLER merge rule: each
    * micro-batch lands its fixed-bin histogram (sparse (bin, cnt)
    * rows — exact counts, q157's binning) in an idempotent
    * `batch=<id>` directory, and counts just ADD across batches — so
    * merge-on-read is a distributed `groupBy(bin).sum`, no driver
    * fold at all. The estimate carries q157's guarantee over ALL rows
    * ever streamed: within one bin width of the order statistic at
    * rank ⌈p·n⌉ (s33 pins it against exact on the replayed rows,
    * across restarts). */
  def histogramSink(df: DataFrame, valCol: String,
      lo: Double, hi: Double, bins: Int,
      storePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(bins >= 1 && hi > lo, s"bad histogram config: [$lo, $hi) / $bins")
    val w = (hi - lo) / bins
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = new Path(s"$storePath/batch=$batchId")
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        CdcStreams.writeIfUncommitted(_.getFileSystem(conf), conf, dir) {
          batch.select(least(lit(bins - 1), greatest(lit(0),
              floor((col(valCol) - lo) / w))).cast("int").as("bin"))
            .groupBy("bin").agg(count(lit(1)).as("cnt"))
            .coalesce(1)
            .write.mode("overwrite").parquet(dir.toString)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
  }

  /** Streaming GLOBAL distinct count (s34) — the third instance of the
    * store-outside-state template (top-k s31, quantiles s33): each
    * micro-batch lands ONE row `(n, sk)` where `sk` is Spark's own
    * Datasketches HLL binary (`hll_sketch_agg` — mergeable by
    * construction, the same persisted-sketch contract q149 pins in
    * batch), and the global estimate is `hll_union_agg` over the
    * stored rows — distributed, no driver fold. Exactly-once across
    * restarts by the `batch=<id>` idempotence protocol; estimate
    * within the sketch's standard error of the true distinct count
    * over ALL rows ever streamed (s34 pins 5%-of-exact, the q28/q149
    * contract). */
  def hllSketchSink(df: DataFrame, keyCol: String,
      storePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = new Path(s"$storePath/batch=$batchId")
        val conf = batch.sparkSession.sparkContext.hadoopConfiguration
        CdcStreams.writeIfUncommitted(_.getFileSystem(conf), conf, dir) {
          batch.agg(count(lit(1)).as("n"),
              expr(s"hll_sketch_agg($keyCol)").as("sk"))
            .coalesce(1)
            .write.mode("overwrite").parquet(dir.toString)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)

  /** Merge-on-read distinct estimate over the whole streamed history:
    * one row (approx_distinct, n). */
  def globalDistinct(spark: SparkSession, storePath: String): DataFrame = {
    import spark.implicits._
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root))
      return Seq.empty[(Long, Long)].toDF("approx_distinct", "n")
    val live = liveBatchDirs(fs, root)
    if (live.isEmpty)
      return Seq.empty[(Long, Long)].toDF("approx_distinct", "n")
    spark.read // explicit dir roots, no basePath: no partition inference (a
      // _compact_old_ stand-in is not name=value and must not conflict)
      .parquet(live.map(_.toString): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_distinct"),
        sum("n").as("n"))
  }

  /** Merge-on-read quantile estimates over the whole streamed history:
    * one row per requested (name, p) with the interpolated estimate
    * and the total n. Distributed end to end (bin-keyed sum + a
    * bins-sized window). */
  def globalQuantiles(spark: SparkSession, storePath: String,
      lo: Double, hi: Double, bins: Int,
      ps: Seq[(String, Double)]): DataFrame = {
    import spark.implicits._
    require(ps.nonEmpty, "globalQuantiles: ps must be non-empty")
    val w = (hi - lo) / bins
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root))
      return Seq.empty[(String, Double, Long)].toDF("q", "est", "n")
    val live = liveBatchDirs(fs, root)
    if (live.isEmpty)
      return Seq.empty[(String, Double, Long)].toDF("q", "est", "n")
    val cum = spark.read // explicit dir roots, no basePath: no partition inference (a
      // _compact_old_ stand-in is not name=value and must not conflict)
      .parquet(live.map(_.toString): _*)
      .groupBy("bin").agg(sum("cnt").as("cnt"))
      .withColumn("cum", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.orderBy("bin")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))))
    val qArr = array(ps.map { case (nm, p) =>
      struct(lit(nm).as("qname"), lit(p).as("p")) }: _*)
    cum.select(col("bin"), col("cnt"), col("cum"), col("n"),
        explode(qArr).as("q"))
      .select(col("bin"), col("cnt"), col("cum"), col("n"),
        col("q.qname").as("q"), (col("q.p") * col("n")).as("t"))
      // the unique CROSSING bin (prevcum < t ≤ cum) — interpolating
      // anywhere else is meaningless (see q157's crossing-bin note)
      .where(col("cum") >= col("t") && col("cum") - col("cnt") < col("t"))
      .groupBy("q")
      .agg(min(lit(lo) + lit(w) *
          (col("bin") + (col("t") - (col("cum") - col("cnt"))) / col("cnt")))
          .as("est"),
        max("n").as("n"))
  }
}
