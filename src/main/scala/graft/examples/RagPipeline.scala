package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The RETRIEVAL path of a RAG stack, composed end to end from the
  * library's own operators — the user journey the retrieval keys
  * (q168 chunking, q169/q173 incremental index + BM25, q84 cosine,
  * q174 RRF, q162 MMR) exist to serve:
  *
  *   1. chunk     — sliding token windows with overlap (q168's
  *                  closed-form fan-out; map-side, no shuffle)
  *   2. ingest    — chunk rows MERGE into a lake store keyed
  *                  (doc, ci) with a pre-image change feed; a doc
  *                  UPDATE whose new text yields fewer chunks must
  *                  tombstone the vanished chunk ids — `chunkDelta`
  *                  derives exactly that batch (upserts + trailing
  *                  tombstones) from old vs new chunk sets
  *   3. index     — `IncrementalIndex` postings + the doc-length
  *                  view fold the feed: the index stays fresh across
  *                  later merges without rescanning the corpus
  *   4. retrieve  — BM25 over the index at CHUNK grain, rolled up to
  *                  parent docs by max chunk score (the
  *                  parent-document retriever), ranked; fused with a
  *                  vector ranking by reciprocal rank (q174's rule)
  *   5. diversify — MMR re-rank over the fused candidates'
  *                  embeddings (Similarity.mmrRerank)
  *
  * Scale: chunking and scoring are the corpus-sized stages and keep
  * their proven plans; everything after the per-retriever top-N is
  * k-sized. Every stage is deterministic (rounded scores, id
  * tie-breaks) — two runs of the whole path produce identical
  * retrievals (spec-pinned).
  */
object RagPipeline {

  /** Sliding `size`-token windows at stride `stride` (tail window
    * kept; ≤ 1-window docs emit exactly one chunk): (id, ci, chunk).
    * q168's closed-form fan-out as a reusable operator. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 12, stride: Int = 8): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"bad chunking: size=$size stride=$stride")
    docs
      .withColumn("__toks",
        expr(s"filter(split($textCol, ' '), w -> w <> '')"))
      .where(org.apache.spark.sql.functions.size(col("__toks")) >= 1)
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0,
              greatest(cast(ceil((size(__toks) - $size) / $stride.0) as int), 0)),
            i -> concat_ws(' ', slice(__toks, i * $stride + 1, $size)))"""))
        .as(Seq("ci", "chunk")))
  }

  /** The MERGE batch that moves the chunk store from `prev` to `next`
    * (both (id, ci, chunk) frames): upserts for new/changed chunk
    * ids, TOMBSTONES for ids only `prev` has — without them a doc
    * whose update shrank its chunk count would serve stale trailing
    * chunks forever (the chunk-grain CDC hazard this artifact
    * encodes). Pure full-outer diff on the (id, ci) key. */
  def chunkDelta(next: DataFrame, prev: DataFrame,
      idCol: String): DataFrame = {
    val n = next.select(col(idCol), col("ci"),
      col("chunk").as("__new"))
    val p = prev.select(col(idCol), col("ci"),
      col("chunk").as("__old"))
    n.join(p, Seq(idCol, "ci"), "full_outer")
      .where(col("__new").isNull || col("__old").isNull ||
        col("__new") =!= col("__old"))
      .select(col(idCol), col("ci"),
        coalesce(col("__new"), lit("")).as("chunk"),
        col("__new").isNull.as("is_delete"))
  }

  /** Merge a chunk batch (id, ci, chunk[, is_delete]) into the store,
    * publishing the pre-image feed the index folds. */
  def ingest(spark: SparkSession, storeDir: String, cdfDir: String,
      batch: DataFrame, idCol: String, ver: Long): Unit = {
    val b = (if (batch.columns.contains("is_delete")) batch
             else batch.withColumn("is_delete", lit(false)))
      .withColumn("ver", lit(ver))
    graft.sources.Lake.mergeInto(spark, storeDir, b,
      Seq(idCol, "ci"), Seq("ver"), Some(col("is_delete")),
      changeDir = Some(cdfDir), cdfPreImages = true)
  }

  /** Fold pending feed entries into the postings index and the
    * doc-length view (no-ops when nothing is pending). */
  def refreshIndex(spark: SparkSession, idxDir: String, dlDir: String,
      cdfDir: String, idCol: String): Unit = {
    val toks = expr("filter(split(chunk, ' '), w -> w <> '')")
    IncrementalIndex.refresh(spark, idxDir, cdfDir,
      Seq(idCol, "ci"), toks)
    IncrementalIndex.refreshDocLens(spark, dlDir, cdfDir,
      Seq(idCol, "ci"), toks)
    ()
  }

  /** Parent-doc lexical ranking: BM25 at chunk grain over the index,
    * rolled up to the parent doc by MAX chunk score, ranked on the
    * (rounded score, id) order, top-N. The rank window runs over the
    * N-row frame only (q174's discipline). */
  def lexicalDocRanks(spark: SparkSession, idxDir: String, dlDir: String,
      idCol: String, terms: Seq[String], topN: Int): DataFrame =
    docRanksFrom(IncrementalIndex.bm25Lookup(spark, idxDir, dlDir,
      Seq(idCol, "ci"), terms, topK = 0), idCol, topN)

  private def docRanksFrom(bm25: DataFrame, idCol: String,
      topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bm25
      .groupBy(idCol)
      .agg(graft.queries.Det.r4e(max("bm25")).as("__sc"))
      .orderBy(col("__sc").desc, col(idCol).asc).limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__sc").desc, col(idCol).asc)).cast("int"))
      .select(col(idCol), col("rank"))
  }

  /** [[refreshIndex]] with the COMPOSED COMMIT (round 18 — the
    * cross-store atomic publish): refresh both derived stores, then
    * publish ONE [[graft.sources.PublishSet]] manifest naming the
    * (index, doc-length view) version PAIR. A crash between the two
    * member refreshes leaves the previous manifest current, so
    * [[lexicalDocRanksPublished]] keeps serving the previous
    * CONSISTENT pair — never a fresh index against a stale view's
    * N/avgdl (the torn-state window the unpublished path has).
    * Crash recovery: a death inside the publish step strands its
    * claim; re-running self-heals after `Snapshot.DefaultClaimGraceMs`
    * (publish's age-gated sweep), or call
    * `PublishSet.recoverStrandedClaim` from the restart path to
    * recover immediately (restart only — beside a live publisher it
    * erases a live claim). Returns the published version. */
  def refreshIndexPublished(spark: SparkSession, idxDir: String,
      dlDir: String, cdfDir: String, pubDir: String,
      idCol: String, attempts: Int = 1): Long = {
    import org.apache.hadoop.fs.Path
    import graft.sources.{PublishSet, Snapshot}
    refreshIndex(spark, idxDir, dlDir, cdfDir, idCol)
    val conf = spark.sparkContext.hadoopConfiguration
    def v(d: String): Long = {
      val p = new Path(d)
      Snapshot.currentVersion(p.getFileSystem(conf), p).getOrElse(
        throw new IllegalStateException(s"no committed store at $d"))
    }
    val pub = new Path(pubDir)
    // the member map re-derives per attempt — publishRetrying's rebase
    // contract (attempts = 1 keeps the loud single-attempt default)
    PublishSet.publishRetrying(pub.getFileSystem(conf), conf, pub,
      () => Map("index" -> v(idxDir), "doclen" -> v(dlDir)),
      attempts = attempts)
  }

  /** [[lexicalDocRanks]] pinned to the last PUBLISHED (index, view)
    * pair — the only read path that is torn-state-free by
    * construction: both stores resolve from one manifest, so a
    * reader racing a multi-store refresh sees the old pair or the
    * new pair, never a mix. */
  def lexicalDocRanksPublished(spark: SparkSession, idxDir: String,
      dlDir: String, pubDir: String, idCol: String, terms: Seq[String],
      topN: Int): DataFrame = {
    import org.apache.hadoop.fs.Path
    import graft.sources.PublishSet
    val pub = new Path(pubDir)
    val fs = pub.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pinned = PublishSet.resolve(fs, pub).getOrElse(
      throw new IllegalStateException(s"nothing published at $pubDir"))
    require(pinned.contains("index") && pinned.contains("doclen"),
      s"publish manifest at $pubDir lacks index/doclen members: $pinned")
    docRanksFrom(IncrementalIndex.bm25Lookup(spark, idxDir, dlDir,
      Seq(idCol, "ci"), terms, topK = 0,
      atIndex = pinned.get("index"), atView = pinned.get("doclen")),
      idCol, topN)
  }

  /** Reciprocal-rank fusion of two ranked lists (idCol, rank):
    * score = Σ 1/(c + rank) over the lists an id appears in, top-k
    * on (score desc, id asc) — q174's rule as a reusable operator
    * over two k-sized frames (the join is broadcast-trivial). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
      c: Int = 60): DataFrame =
    a.select(col(idCol), col("rank").as("__ra"))
      .join(b.select(col(idCol), col("rank").as("__rb")),
        Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(lit(1.0) / (lit(c) + col("__ra")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(c) + col("__rb")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)

  /** MMR-diversify fused candidates: re-rank the candidate ids'
    * embeddings against the query vector (Similarity.mmrRerank with
    * one query). The MMR pool must hold at least k candidates or the
    * generic k silently truncates to the pool size, so `topN` scales
    * with k (floor 12 keeps a diversity margin for small k; `poolCap`
    * bounds the N² pair stage for large k). Returns
    * (rank, id, score). */
  def diversify(candidates: DataFrame, embeddings: DataFrame,
      idCol: String, vecCol: String, queryVec: DataFrame,
      k: Int, lambda: Double = 0.7, poolCap: Int = 256): DataFrame = {
    require(k <= poolCap,
      s"diversify: k=$k exceeds the MMR pool cap $poolCap — raise poolCap " +
        "(pair stage is O(poolCap^2) per query)")
    val cand = embeddings.join(candidates.select(idCol), idCol)
    graft.operators.Similarity.mmrRerank(cand,
        queryVec.select(lit(0L).as("__qid"), col("qv").as("__qv")),
        idCol, vecCol, "__qid", "__qv",
        topN = math.max(k, 12), k = k, lambda = lambda)
      .select(col("rank"), col("vec_id"), col("score"))
  }
}
