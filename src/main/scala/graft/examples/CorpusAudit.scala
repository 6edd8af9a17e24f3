package graft.examples

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Snapshot

/** The scheduled CORPUS AUDIT — the health check a training-data
  * pipeline runs between ingestion and mixing, composing the
  * round-15 diagnostics into ONE versioned report artifact
  * (LakeOps' shape, pointed at corpus quality instead of lake
  * maintenance):
  *
  *   1. expectations — the q194 one-scan rule pass over the document
  *      table (text present, language in domain, n_chars agrees with
  *      the text) → per-rule violation counts
  *   2. language mix — per-language doc counts and shares (the
  *      mixture-weight input drifting silently is the classic
  *      pipeline regression)
  *   3. Zipf fit — q199's frequency-spectrum slope/r² (template spam
  *      and failed dedup move it)
  *   4. length histogram — n_chars binned on a FIXED global grid
  *      (cross-version comparability is the point: a data-dependent
  *      grid re-normalizes away exactly the shift being monitored)
  *   5. PSI drift — q200's decomposition of THIS run's histogram
  *      against the PREVIOUS audit version's (first run: no drift
  *      section) — the audit is incremental by construction: each
  *      run reads back one bins-sized table, never a prior corpus
  *
  * Every run commits (report, histogram) through `Snapshot.commit`,
  * so reports version like data: `report(store, Some(v))` is time
  * travel over audit history, concurrent readers never see a
  * half-written report, and a crashed run strands only hidden
  * `_stage.` dirs that the next run's `stageDirName` clears.
  *
  * Scale: one scan of the corpus for the rule pass + histogram, one
  * token pass for the Zipf vocabulary (the q109/q111 word-keyed
  * shuffle), everything else bins/languages/rules-sized. The PSI
  * compare reads ≤ `Bins` rows from the store.
  */
object CorpusAudit {

  private val Bins = 10
  /** Fixed n_chars grid: [0, CharCap) in Bins equal bins, overflow
    * clamps to the last bin. Fixed ACROSS versions by construction. */
  private val CharCap = 1000.0

  private def histogram(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val binned = docs.select(
        least(floor(col("n_chars") / lit(CharCap / Bins)), lit(Bins - 1.0))
          .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    spark.range(Bins).select(col("id").cast("int").as("bin"))
      .join(binned, Seq("bin"), "left")
      .na.fill(0L, Seq("cnt"))
  }

  /** (section, k, cnt, metric) report rows for one corpus snapshot;
    * `prevHist` (bin, cnt) adds the drift section. */
  private def buildReport(docs: DataFrame,
      prevHist: Option[DataFrame]): DataFrame = {
    val spark = docs.sparkSession
    // 1. expectations — all rules in ONE scan (the q194 shape)
    val rules = Seq(
      "r_text_present" -> (col("text").isNull || length(col("text")) === 0),
      "r_lang_domain" -> !col("lang").isin("en", "de", "fr", "es", "zh"),
      "r_chars_agree" -> (col("n_chars") =!= length(col("text"))))
    val aggs = rules.zipWithIndex.map { case ((_, bad), i) =>
      sum(when(bad, lit(1L)).otherwise(lit(0L))).as(s"v$i") }
    val stackArgs = rules.zipWithIndex
      .map { case ((rid, _), i) => s"'$rid', v$i" }.mkString(", ")
    val expect = docs.agg(count(lit(1)).as("n"), aggs: _*)
      .selectExpr(s"stack(${rules.size}, $stackArgs) AS (k, cnt)", "n")
      .select(lit("expectations").as("section"), col("k"), col("cnt"),
        (col("cnt").cast("double") / col("n")).as("metric"))
    // 2. language mix
    val langs = docs.groupBy(col("lang").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val mix = langs
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
      .select(lit("lang_mix").as("section"), col("k"), col("cnt"),
        (col("cnt").cast("double") / col("n")).as("metric"))
    // 3. Zipf fit (the q199 shape: one vocabulary shuffle, ≤1000-row fit)
    val v = docs.select(explode(
        expr("filter(split(text, ' '), w -> w <> '')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val top = v.orderBy(col("cnt").desc, col("w").asc).limit(1000)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("w").asc)))
    val zipf = top.agg(
        expr("regr_slope(ln(cnt), ln(rnk))").as("slope"),
        expr("regr_r2(ln(cnt), ln(rnk))").as("r2"))
      .crossJoin(broadcast(
        v.agg(count(lit(1)).as("n_types"), sum("cnt").as("n_tokens"))))
      .selectExpr(
        """stack(4, 'slope', CAST(NULL AS BIGINT), slope,
                    'r2', CAST(NULL AS BIGINT), r2,
                    'n_types', n_types, CAST(n_types AS DOUBLE),
                    'n_tokens', n_tokens, CAST(n_tokens AS DOUBLE))
           AS (k, cnt, metric)""")
      .select(lit("zipf").as("section"), col("k"), col("cnt"), col("metric"))
    // 4. entropy health (the q207 shape: two stacked hash aggregates,
    // per-doc state is two accumulators) — per-language mean word
    // entropy; a language whose mean H collapses between versions is
    // filling with boilerplate even when its mix share is stable
    val ent = docs
      .select(col("doc_id"), col("lang"),
        explode(expr("filter(split(text, ' '), w -> w <> '')")).as("w"))
      .groupBy("doc_id", "lang", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "lang")
      .agg(sum("c").as("n"),
        sum(col("c") * log(col("c").cast("double"))).as("clc"))
      .select(col("lang"), (log(col("n").cast("double")) -
        col("clc") / col("n").cast("double")).as("h"))
      .groupBy(col("lang").as("k"))
      .agg(count(lit(1)).as("cnt"), avg("h").as("metric"))
      .select(lit("entropy").as("section"), col("k"), col("cnt"),
        col("metric"))
    // 5. PSI vs the previous version's stored histogram (q200's math)
    val drift = prevHist.map { ph =>
      val cur = histogram(docs)
      val tot = ph.agg(sum("cnt").as("nr"))
        .crossJoin(cur.agg(sum("cnt").as("nc")))
      val rs = (col("ref_cnt") + lit(0.5)) / (col("nr") + lit(Bins / 2.0))
      val cs = (col("cur_cnt") + lit(0.5)) / (col("nc") + lit(Bins / 2.0))
      ph.select(col("bin"), col("cnt").as("ref_cnt"))
        .join(cur.select(col("bin"), col("cnt").as("cur_cnt")), "bin")
        .crossJoin(broadcast(tot))
        .select(((rs - cs) * log(rs / cs)).as("contrib"))
        .agg(sum("contrib").as("psi"))
        .select(lit("drift").as("section"), lit("psi").as("k"),
          lit(null).cast("long").as("cnt"), col("psi").as("metric"))
    }
    (Seq(expect, mix, zipf, ent) ++ drift).reduce(_ unionByName _)
  }

  /** Run one audit over `docs`, committing (report, histogram) as the
    * store's next snapshot version. Returns the committed version. */
  def runAudit(spark: SparkSession, docs: DataFrame, store: String): Long = {
    val dir = new Path(store)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    // resolve the commit base FIRST and read prevHist from that same
    // version (round-13 ADVICE: re-reading currentVersion after the
    // members() resolution let a racer commit in between — the CAS
    // would then pass while the drift section was computed against a
    // stale previous histogram, the lost-update window `base` closes)
    val baseV = Snapshot.currentVersion(fs, dir).getOrElse(0L)
    val prevHist =
      if (baseV == 0L) None
      else {
        val histName = Snapshot.members(fs, dir, baseV)
          .find(_.endsWith("-hist"))
          .getOrElse(sys.error(s"audit store $store v$baseV has no -hist member"))
        Some(spark.read.parquet(new Path(dir, histName).toString))
      }
    val reportName = Snapshot.stageDirName(fs, dir, "report")
    val histName = Snapshot.stageDirName(fs, dir, "hist")
    buildReport(docs, prevHist)
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(Snapshot.stagePath(dir, reportName).toString)
    histogram(docs)
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(Snapshot.stagePath(dir, histName).toString)
    Snapshot.commit(fs, conf, dir, Seq(reportName, histName), base = baseV)
  }

  /** Read the audit report at `version` (default: current) — time
    * travel over audit history through the snapshot manifests. */
  def report(spark: SparkSession, store: String,
      version: Option[Long] = None): DataFrame = {
    val dir = new Path(store)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = version.orElse(Snapshot.currentVersion(fs, dir))
      .getOrElse(sys.error(s"audit store $store has no committed version"))
    val name = Snapshot.members(fs, dir, v).find(_.endsWith("-report"))
      .getOrElse(sys.error(s"audit store $store v$v has no -report member"))
    spark.read.parquet(new Path(dir, name).toString)
  }
}
