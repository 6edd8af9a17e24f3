package graft.examples

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Lake, Snapshot}

/** Incremental INVERTED-INDEX maintenance from a merge change feed —
  * the text-search twin of [[IncrementalView]]: a token → document
  * postings table over a 100 TB merged corpus stays fresh by folding
  * each merge's row-level diff instead of re-tokenizing the corpus
  * (the q130 one-shot build, made continuous).
  *
  * The index is the postings MULTISET `(token, docKey…, tf)` where
  * `tf` is the token's occurrence count in that document. Occurrence
  * counts are ABELIAN under the pre-image feed signs
  * (+1 · insert/update_postimage, −1 · update_preimage/delete applied
  * per exploded token), so any set of feed entries folds in ONE
  * aggregate: an update re-tokenizes only the changed document —
  * −tokens(pre) cancels +tokens(pre) wherever the text didn't change
  * semantically, and a delete subtracts the document's whole postings
  * contribution. A posting whose tf reaches zero leaves the index.
  * Unlike max/min view columns there is NO shrink case and no base
  * re-read, ever: a leaving document subtracts its own tokens.
  *
  * Exactly-once across crashes: same protocol as the view — the
  * postings store is a versioned [[Snapshot]] store whose
  * `_applied_upto_<k>` marker rides the atomic pointer commit with the
  * data it describes, and a crash-replayed MERGE publishes an empty
  * feed. See IncrementalView's scaladoc for the full argument; the
  * marker/pending machinery is shared.
  *
  * Scale shape: the fold is explode → map-side-combinable aggregate
  * keyed on (token, docKey); the store join is keyed on the same
  * grain. The store itself is corpus-token-sized (the q130 lesson:
  * a stopword's postings at 100 TB are TB-sized) — which is exactly
  * why it must be maintained incrementally and partitioned by token
  * hash on a real cluster; nothing here ever collects it. Readers
  * that want document-frequency or tf-idf derive them from the
  * postings grain ([[docFreq]], [[lookupAll]]) as bounded aggregates
  * over the probed terms only.
  */
object IncrementalIndex {

  private def appliedUpto(fs: FileSystem, store: Path): Long =
    Snapshot.resolve(fs, store).getOrElse(Nil).flatMap { member =>
      fs.listStatus(member).map(_.getPath.getName)
        .filter(_.startsWith("_applied_upto_"))
        .map(_.stripPrefix("_applied_upto_").toLong)
    }.foldLeft(-1L)(math.max)

  /** Fold every unapplied feed entry's token deltas into the postings
    * store; returns the new applied-upto id. `tokens` is a
    * DETERMINISTIC expression over the feed row producing the
    * document's token array (it re-evaluates on every fold — the
    * house tokenizer `filter(split(text, ' '), w -> w <> '')` is the
    * expected shape). */
  def refresh(spark: SparkSession, indexDir: String, changeDir: String,
      keyCols: Seq[String], tokens: Column): Long = {
    val store = new Path(indexDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = store.getFileSystem(conf)
    val pending =
      IncrementalView.pendingFeedIds(spark, indexDir, changeDir)
    if (pending.isEmpty) return appliedUpto(fs, store)
    val sign = when(col("_op").isin("insert", "update_postimage"), 1L)
      .when(col("_op").isin("update_preimage", "delete"), -1L)
      .otherwise(raise_error(concat(
        lit("IncrementalIndex: feed entry without pre-images (_op="),
        col("_op"),
        lit(") — publish the feed with cdfPreImages = true"))))
    val feed = spark.read.option("mergeSchema", "true")
      .parquet(pending.map(k => s"$changeDir/merge=$k"): _*)
    val deltas = feed
      .select((col("_op") +: keyCols.map(col)) :+
        explode(tokens).as("token"): _*)
      .groupBy(col("token") +: keyCols.map(col): _*)
      .agg(sum(sign).as("__dtf"))
    val current: Option[DataFrame] =
      if (Snapshot.currentVersion(fs, store).isDefined)
        Some(Lake.readStore(spark, indexDir))
      else None
    val next = current match {
      case None =>
        deltas.where(col("__dtf") =!= 0L)
          .select((col("token") +: keyCols.map(col)) :+
            col("__dtf").as("tf"): _*)
      case Some(cur) =>
        val grain = "token" +: keyCols
        val d2 = deltas.select(
          (col("token").as("__d_token") +:
            keyCols.map(c => col(c).as(s"__d_$c"))) :+ col("__dtf"): _*)
        val cond = grain.map(c => col(c) <=> col(s"__d_$c")).reduce(_ && _)
        cur.join(d2, cond, "full_outer")
          .select(grain.map(c =>
            coalesce(col(c), col(s"__d_$c")).as(c)) :+
            (coalesce(col("tf"), lit(0L)) +
              coalesce(col("__dtf"), lit(0L))).as("tf"): _*)
          .where(col("tf") =!= 0L)
    }
    val stageName = Snapshot.stageDirName(fs, store, "idx")
    val staged = Snapshot.stagePath(store, stageName)
    next.write.mode("overwrite").parquet(staged.toString)
    val marker = new Path(staged, s"_applied_upto_${pending.max}")
    val out = fs.create(marker, true); out.close()
    Snapshot.commit(fs, conf, store, Seq(stageName))
    Snapshot.vacuum(fs, store, keep = 2)
    pending.max
  }

  /** The postings table (token, keyCols…, tf). */
  def read(spark: SparkSession, indexDir: String): DataFrame =
    Lake.readStore(spark, indexDir)

  /** Document frequency per token — one bounded aggregate over the
    * postings grain (each (token, doc) row counts once). */
  def docFreq(spark: SparkSession, indexDir: String): DataFrame =
    read(spark, indexDir).groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("tf"))

  /** Conjunctive term lookup: documents containing ALL `terms`,
    * scored by summed tf. The probe filters the postings to the
    * queried terms FIRST (an n-term IN list — pushed to the postings
    * scan), so the work is ∝ the probed terms' postings, never the
    * index size. */
  def lookupAll(spark: SparkSession, indexDir: String,
      keyCols: Seq[String], terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "lookupAll needs at least one term")
    read(spark, indexDir)
      .where(col("token").isin(terms: _*))
      .groupBy(keyCols.map(col): _*)
      .agg(countDistinct(col("token")).as("__hit"), sum("tf").as("score"))
      .where(col("__hit") === terms.distinct.length)
      .drop("__hit")
  }
}
