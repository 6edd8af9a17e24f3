package graft.examples

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Lake, Snapshot}

/** Incremental MATERIALIZED-VIEW maintenance from a merge change feed
  * — the consumer the pre-image CDF shape
  * (`Lake.mergeInto(cdfPreImages = true)`) exists for, and the reason
  * a lake keeps a change feed at all: a grouped aggregate over a
  * 100 TB merged table stays fresh by reading each merge's row-level
  * DIFF (KBs–MBs) instead of re-scanning the table (TBs).
  *
  * The view is `SELECT groupCols, count(*), sum(sumCols…) GROUP BY
  * groupCols`, materialized as its own versioned snapshot store. Each
  * `refresh` folds every unapplied `merge=<k>` feed entry into signed
  * per-group deltas —
  *
  *   +1 · insert, +1 · update_postimage,
  *   −1 · update_preimage, −1 · delete
  *
  * — and commits `old view ⊕ deltas` as the view store's next
  * version. Count and sum are ABELIAN (every delta commutes), so any
  * set of feed entries folds in one aggregate regardless of merge
  * order, and an update that migrates a row across groups nets
  * −1 on the old group and +1 on the new one — correct without ever
  * touching the base store. A group whose count reaches zero leaves
  * the view. (Non-subtractable aggregates — min/max/distinct — need
  * the base table on shrink; they are exactly what this consumer does
  * NOT claim.)
  *
  * Exactly-once across crashes: the view store remembers the highest
  * applied feed id INSIDE each version's data dir (an
  * `_applied_upto_<k>` marker file written into the STAGED dir, so it
  * rides `Snapshot.commit`'s atomic pointer rename with the data it
  * describes). A refresh crash before the commit strands an invisible
  * staging dir (next refresh deletes it and recomputes from the same
  * applied-upto — same deltas, same result); after the commit, the
  * marker has already advanced and a re-run applies nothing. A
  * crash-replayed MERGE publishes an empty feed (no new `merge=` dir),
  * so the view sees each logical change exactly once end-to-end.
  *
  * Scale shape: deltas aggregate feed rows (map-side combinable,
  * keyed on the group); the view join is group-keyed over two
  * view-sized frames (the view is #groups rows — bounded by the
  * domain, not the data); nothing re-reads the base store, ever.
  */
object IncrementalView {

  private def appliedUpto(fs: FileSystem, view: Path): Long =
    Snapshot.resolve(fs, view).getOrElse(Nil).flatMap { member =>
      fs.listStatus(member).map(_.getPath.getName)
        .filter(_.startsWith("_applied_upto_"))
        .map(_.stripPrefix("_applied_upto_").toLong)
    }.foldLeft(-1L)(math.max)

  /** Feed ids not yet folded into the view (ascending). */
  def pendingFeedIds(spark: SparkSession, viewDir: String,
      changeDir: String): Seq[Long] = {
    val view = new Path(viewDir)
    val cd = new Path(changeDir)
    val fs = view.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val upto = appliedUpto(fs, view)
    if (!fs.exists(cd)) return Nil
    fs.listStatus(cd).map(_.getPath.getName)
      .filter(_.startsWith("merge="))
      .map(_.stripPrefix("merge=").toLong)
      .filter(_ > upto).sorted.toSeq
  }

  /** Fold every unapplied feed entry into the view store; returns the
    * new applied-upto id (unchanged if the feed had nothing new). */
  def refresh(spark: SparkSession, viewDir: String, changeDir: String,
      groupCols: Seq[String], sumCols: Seq[String]): Long =
    refresh(spark, viewDir, changeDir, groupCols, sumCols, Nil, None)

  /** `refresh` with MAX columns — the honest treatment of a
    * NON-subtractable aggregate. Grows fold from the feed like any
    * delta (new max = greatest(old max, max of post-images)); a
    * SHRINK — a pre-image equal to the group's current max leaving,
    * with no grow covering it — cannot be answered from the feed, so
    * exactly those groups recompute their max from `baseDir` (the
    * merged base store), filtered to the affected group set. Cost:
    * zero base reads while maxes only grow; one group-pruned base
    * aggregate when a max actually leaves.
    *
    * Max entries fold ONE AT A TIME (unlike the abelian count/sum
    * path, which folds every pending entry in one aggregate): within
    * a multi-entry window an insert's post-image can be superseded by
    * a later entry's update (insert x=50, then update to 1 — a
    * combined fold would see gmax=50 and keep a phantom max). A
    * single merge diff carries each key at most once, so per-entry
    * folding is sound. During a multi-entry catch-up the intermediate
    * committed versions may transiently reflect the NEWER base on a
    * recompute; the final (caught-up) version is exact — the
    * single-writer, refresh-after-merge discipline every consumer of
    * this store already follows. */
  def refresh(spark: SparkSession, viewDir: String, changeDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      maxCols: Seq[String], baseDir: Option[String]): Long =
    refresh(spark, viewDir, changeDir, groupCols, sumCols, maxCols, Nil,
      baseDir)

  /** Full form: MAX and MIN columns (min is the exact mirror — the
    * champion is the LOWEST value, a grow is a lower post-image, a
    * leaving champion triggers the same group-pruned base
    * recompute). */
  def refresh(spark: SparkSession, viewDir: String, changeDir: String,
      groupCols: Seq[String], sumCols: Seq[String],
      maxCols: Seq[String], minCols: Seq[String],
      baseDir: Option[String]): Long = {
    val exts = maxCols.map(Ext(_, isMax = true)) ++
      minCols.map(Ext(_, isMax = false))
    require(exts.isEmpty || baseDir.isDefined,
      "IncrementalView: max/min columns need baseDir (shrinks recompute from the base)")
    val view = new Path(viewDir)
    val fs = view.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pending = pendingFeedIds(spark, viewDir, changeDir)
    if (pending.isEmpty) return appliedUpto(fs, view)
    if (exts.isEmpty) applyEntries(spark, view, changeDir, pending,
      groupCols, sumCols, Nil, None)
    else pending.foreach(k => applyEntries(spark, view, changeDir, Seq(k),
      groupCols, sumCols, exts, baseDir))
    pending.max
  }

  /** An extreme-maintained column: direction + its view-column name,
    * per-direction fold/compare helpers. */
  private case class Ext(c: String, isMax: Boolean) {
    val out: String = if (isMax) s"max_$c" else s"min_$c"
    def fold(x: Column): Column = if (isMax) max(x) else min(x)
    def better(a: Column, b: Column): Column =
      if (isMax) greatest(a, b) else least(a, b)
    def worseThan(a: Column, champ: Column): Column =
      if (isMax) a < champ else a > champ
    def agg: String = if (isMax) "max" else "min"
  }

  private def applyEntries(spark: SparkSession, view: Path,
      changeDir: String, ids: Seq[Long], groupCols: Seq[String],
      sumCols: Seq[String], exts: Seq[Ext],
      baseDir: Option[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = view.getFileSystem(conf)
    val sign = when(col("_op").isin("insert", "update_postimage"), 1L)
      .when(col("_op").isin("update_preimage", "delete"), -1L)
      .otherwise(raise_error(concat(
        lit("IncrementalView: feed entry without pre-images (_op="),
        col("_op"),
        lit(") — publish the feed with cdfPreImages = true"))))
    // mergeSchema: feed entries straddling a base-table schema
    // evolution disagree on columns — without it the multi-dir read
    // takes one file's schema and silently drops the others' new
    // columns (a null sum contribution is correct; a dropped column
    // is not)
    val feed = spark.read.option("mergeSchema", "true").parquet(
      ids.map(k => s"$changeDir/merge=$k"): _*)
    val grow = (e: Ext) =>
      e.fold(when(col("_op").isin("insert", "update_postimage"),
        col(e.c))).as(s"__g_${e.out}")
    val leave = (e: Ext) =>
      e.fold(when(col("_op").isin("update_preimage", "delete"),
        col(e.c))).as(s"__p_${e.out}")
    val deltas = feed
      .groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("__dn"),
        sumCols.map(c => sum(sign * col(c)).as(s"__d_$c")) ++
          exts.flatMap(e => Seq(grow(e), leave(e))): _*)
    val current: Option[DataFrame] =
      if (Snapshot.currentVersion(fs, view).isDefined)
        Some(Lake.readStore(spark, view.toString))
      else None
    val merged = current match {
      case None =>
        deltas.where(col("__dn") =!= 0L)
          .select(groupCols.map(col) ++ (col("__dn").as("n") +:
            (sumCols.map(c => col(s"__d_$c").as(s"sum_$c")) ++
              exts.map(e => col(s"__g_${e.out}").as(e.out)))): _*)
          .withColumn("__recompute", lit(false))
      case Some(cur) =>
        // null-safe group match (<=>): a NULL group value must meet
        // its own delta row, not fork a duplicate group per refresh
        val d2 = deltas.select(
          groupCols.map(c => col(c).as(s"__g_$c")) ++
            (col("__dn") +: (sumCols.map(c => col(s"__d_$c")) ++
              exts.flatMap(e =>
                Seq(col(s"__g_${e.out}"), col(s"__p_${e.out}"))))): _*)
        val cond = groupCols.map(c => col(c) <=> col(s"__g_$c"))
          .reduce(_ && _)
        // a group must recompute iff some extreme column's current
        // champion LEFT (a pre-image equals it) and no grow covers it
        val needs =
          if (exts.isEmpty) lit(false)
          else exts.map { e =>
            col(e.out).isNotNull &&
              (col(s"__p_${e.out}") <=> col(e.out)) &&
              (col(s"__g_${e.out}").isNull ||
                e.worseThan(col(s"__g_${e.out}"), col(e.out)))
          }.reduce(_ || _)
        cur.join(d2, cond, "full_outer")
          .select(groupCols.map(c =>
            coalesce(col(c), col(s"__g_$c")).as(c)) ++ (
            (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
              .as("n") +:
            (sumCols.map(c =>
              (coalesce(col(s"sum_$c"), lit(0)) +
                coalesce(col(s"__d_$c"), lit(0))).as(s"sum_$c")) ++
              exts.map(e =>
                e.better(col(e.out), col(s"__g_${e.out}"))
                  .as(e.out)) :+
              needs.as("__recompute"))): _*)
          .where(col("n") =!= 0L)
    }
    val pinned =
      if (exts.isEmpty) None
      else Some(merged.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
    val next =
      if (exts.isEmpty) merged.drop("__recompute")
      else {
        val m = pinned.get
        val needy = m.where(col("__recompute"))
          .select(groupCols.map(col): _*)
        if (needy.isEmpty) m.drop("__recompute")
        else {
          // authoritative maxes for exactly the affected groups: a
          // group-pruned aggregate over the base store (the broadcast
          // side is the needy-group set — bounded by this refresh's
          // touched groups)
          val n2 = needy.select(groupCols.map(c =>
            col(c).as(s"__r_$c")): _*)
          val jcond = groupCols.map(c => col(c) <=> col(s"__r_$c"))
            .reduce(_ && _)
          val authoritative = Lake.readStore(spark, baseDir.get)
            .join(broadcast(n2), jcond, "inner")
            .groupBy(groupCols.map(col): _*)
            .agg(exts.head.fold(col(exts.head.c)).as(s"__a_${exts.head.out}"),
              exts.tail.map(e => e.fold(col(e.c)).as(s"__a_${e.out}")): _*)
            .select(groupCols.map(c => col(c).as(s"__a_$c")) ++
              exts.map(e => col(s"__a_${e.out}")): _*)
          val acond = groupCols.map(c => col(c) <=> col(s"__a_$c"))
            .reduce(_ && _)
          m.join(authoritative, acond, "left")
            .select(groupCols.map(col) ++ (col("n") +:
              (sumCols.map(c => col(s"sum_$c")) ++
                exts.map(e =>
                  when(col("__recompute"),
                    col(s"__a_${e.out}"))
                    .otherwise(col(e.out)).as(e.out)))): _*)
        }
      }
    // stage HIDDEN, stamp the applied-upto marker INSIDE the staged
    // dir, commit with the atomic pointer rename — marker and data
    // are inseparable by construction
    val stageName = Snapshot.stageDirName(fs, view, "view")
    val staged = Snapshot.stagePath(view, stageName)
    next.write.mode("overwrite").parquet(staged.toString)
    val marker = new Path(staged, s"_applied_upto_${ids.max}")
    val out = fs.create(marker, true); out.close()
    Snapshot.commit(fs, conf, view, Seq(stageName))
    Snapshot.vacuum(fs, view, keep = 2)
    } finally { pinned.foreach(_.unpersist()); () }
  }

  /** The view as a DataFrame (groupCols, n, sum_<c>…). */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    Lake.readStore(spark, viewDir)

  /** The partitioned-lake form: `mergeIntoPartitioned` publishes its
    * feed one level deeper (`changeRoot/<partCol>=<v>/merge=<k>`,
    * with ids monotonic PER PARTITION), so the view keeps one
    * sub-view store per partition — `refresh` applied verbatim per
    * directory, each with its own applied-upto marker. That is also
    * the scalable shape: partitions maintain independently (a night
    * touching 2 days folds 2 small feeds) and could run in parallel.
    * Returns the partition dir names that had pending entries. */
  def refreshPartitioned(spark: SparkSession, viewRoot: String,
      changeRoot: String, partCol: String,
      groupCols: Seq[String], sumCols: Seq[String],
      parallelism: Int = 4): Seq[String] = {
    val cr = new Path(changeRoot)
    val fs = cr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cr)) return Nil
    val parts = fs.listStatus(cr).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol=")).sorted.toSeq
    val pending = parts.filter(p =>
      pendingFeedIds(spark, s"$viewRoot/$p", s"$changeRoot/$p").nonEmpty)
    if (pending.isEmpty) return Nil
    // sub-views are independent stores (own dir, own watermark), so
    // their refreshes run CONCURRENTLY — each is a couple of small
    // Spark jobs, and a sequential driver loop would serialize
    // #partitions × job-launch latency. Bounded pool: the win is
    // overlapping job scheduling, not saturating the cluster.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, pending.length))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      Await.result(
        Future.sequence(pending.map(p => Future {
          refresh(spark, s"$viewRoot/$p", s"$changeRoot/$p",
            groupCols, sumCols)
        })), Duration.Inf)
      pending
    } finally pool.shutdown()
  }

  /** Feed RETENTION for this consumer: delete `merge=<k>` entries the
    * view has already folded (k ≤ its applied-upto) — the sweep that
    * keeps a long-lived feed from growing one directory per merge
    * forever. Two deliberate rules:
    *
    *  - the HIGHEST-id entry present always survives, even when
    *    consumed: `publishCdf` derives the next id from the listing
    *    (single-writer max+1), so deleting every entry would RESET
    *    ids below the view's applied-upto and the replacement entries
    *    would never be applied — the one retained dir carries the
    *    watermark. Bounded cost: one extra entry on disk.
    *  - the applied-upto is THIS view's; with several independent
    *    consumers on one feed, sweep at min(applied-upto) — the
    *    caller coordinates (same single-writer discipline as the
    *    merge target itself).
    *
    * Returns the number of entries deleted. */
  def vacuumConsumedFeed(spark: SparkSession, viewDir: String,
      changeDir: String): Int = {
    val view = new Path(viewDir)
    val cd = new Path(changeDir)
    val fs = view.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val upto = appliedUpto(fs, view)
    if (upto < 0 || !fs.exists(cd)) return 0
    val ids = fs.listStatus(cd).map(_.getPath.getName)
      .filter(_.startsWith("merge="))
      .map(_.stripPrefix("merge=").toLong)
    if (ids.isEmpty) return 0
    val keep = ids.max
    val victims = ids.filter(k => k <= upto && k != keep)
    victims.foreach(k => fs.delete(new Path(cd, s"merge=$k"), true))
    victims.length
  }

  /** Partitioned twin: sweep each partition's feed against its own
    * sub-view watermark. */
  def vacuumConsumedFeedPartitioned(spark: SparkSession, viewRoot: String,
      changeRoot: String, partCol: String): Int = {
    val cr = new Path(changeRoot)
    val fs = cr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(cr)) return 0
    fs.listStatus(cr).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      .map(p => vacuumConsumedFeed(spark, s"$viewRoot/$p", s"$changeRoot/$p"))
      .sum
  }

  /** The whole-lake view from the per-partition sub-views: union and
    * re-aggregate — counts and sums add across partitions, so this is
    * a bounded (#partitions × #groups rows) aggregate, never a base
    * scan. */
  def readPartitioned(spark: SparkSession, viewRoot: String,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val vr = new Path(viewRoot)
    val fs = vr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subs = fs.listStatus(vr).filter(_.isDirectory).map(_.getPath)
      .filter(p => Snapshot.currentVersion(fs, p).isDefined)
    require(subs.nonEmpty, s"no sub-views under $viewRoot")
    // resolve every sub-view's snapshot and read ONE multi-path
    // relation — a per-partition unionByName chain would put
    // #partitions operators in the plan; this stays one scan node at
    // any partition count (a 10k-day lake plans in constant time)
    val paths = subs.flatMap(p =>
      Snapshot.readSet(fs, p).getOrElse(Nil)).map(_.toString)
    spark.read.option("mergeSchema", "true").parquet(paths.toSeq: _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("n").as("n"),
        sumCols.map(c => sum(s"sum_$c").as(s"sum_$c")): _*)
  }
}
