package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Embedding / similarity-search operators (charter extensions,
  * SURVEY.md §2.10): vector norms, brute-force cosine top-k, per-label
  * centroids, cosine near-dup pairs, and an IVF-bucketed ANN that
  * probes one cluster instead of the whole corpus.
  *
  * All element arithmetic casts float→double BEFORE multiplying so
  * both engines run the identical double pipeline; per-vector
  * reductions use `aggregate()` (a sequential fold — same addition
  * order as the oracle's positional sum to within 1e-16, dwarfed by
  * the Det epsilon).
  *
  * Scale: the query vector / centroid table are O(1)-sized →
  * broadcast; per-vector work is map-side lambda math (no explode
  * for q83/q84); top-k goes through TakeOrderedAndProject. The only
  * corpus-sized shuffles are the explicit groupBys (centroid build,
  * IVF assignment), each keyed on bounded-cardinality keys.
  */
object VectorQueries {
  import graft.operators.Similarity.norm

  /** q83: L2 norm per embedding — one map-side fold, no fan-out. */
  private def q83(s: SparkSession, d: String): DataFrame =
    Det.emitWide(spread(s, embeddings(s, d))
      // sqrt routes through libm — epsilon-shift before rounding so a
      // boundary-adjacent norm can't round differently across engines
      .select(col("vec_id"), Det.r6e(norm(col("embedding"))).as("l2")), "vec_id")

  /** q84: brute-force cosine top-10 vs the vec_id=0 query vector. The
    * 1-row query side is broadcast (no collect — stays a pure plan);
    * scoring is map-side; the final top-k short-circuits. This is the
    * exact-baseline for ANN (q95 is the probe-one-cluster variant). */
  private def q84(s: SparkSession, d: String): DataFrame = {
    val em = embeddings(s, d)
    val q = em.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    graft.operators.Similarity.cosineTopK(
      em.where(col("vec_id") =!= 0), q, "vec_id", "embedding", k = 10)
  }

  /** q188: product-quantization ANN with ADC + exact re-rank (round
    * 13 — Similarity.pqTopK: Jégou et al.'s memory-bound serving
    * path): 64-dim vectors compress to m=4 subspace codes against a
    * 16-entry hash-chosen codebook; the query's 4×16 distance table
    * broadcasts, the ADC shortlist (20) short-circuits on the summed
    * lookups, and exact cosine runs on the shortlist only — the full
    * float corpus never scans at query time, only the code table.
    * Every decision float is rounded first (argmin r6e + j
    * tie-break, shortlist r6e + id, re-rank r4e + id), which is what
    * lets the oracle replay all four stages. */
  private def q188(s: SparkSession, d: String): DataFrame = {
    val em = spread(s, embeddings(s, d))
    val q = em.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    graft.operators.Similarity.pqTopK(
        em.where(col("vec_id") =!= 0), q, "vec_id", "embedding",
        dim = 64, m = 4, kc = 16, shortlist = 20, k = 10)
      .orderBy("rank")
  }

  /** q219: IVF RECALL CURVE over nprobe (round 17 — the calibration
    * that SIZES q95's one free parameter, exactly as q189 calibrates
    * q188's PQ and q143 calibrates MinHash banding: how much recall
    * does each additional probed cell buy?): recall@10 of the IVF
    * candidate set against the exact top-10, at nprobe ∈ {1, 2, 4}.
    * Because IVF scores candidates with the SAME exact cosine as the
    * flat search, a true top-10 member is recovered iff its indexed
    * cell is probed — so recall = |probed-cells' members ∩ exact
    * top-10| / 10, and the curve isolates pure PARTITION loss (no
    * quantization term, unlike q189). Scale: centroid frame is tiny
    * (broadcast); the corpus assignment is q95's positional
    * join + hash aggregate; the three probe runs rescore only the
    * 1-row query; hits are ≤10-row semi-joins. Assignment argmax is
    * round(sc,6)+label tie-broken (the q95 contract), so the oracle
    * replays the full chain. */
  private def q219(s: SparkSession, d: String): DataFrame = {
    val em = spread(s, embeddings(s, d))
    val cent = graft.operators.Similarity
      .ivfCentroids(em, "label", "embedding").transform(Det.pin)
    val corpus = em.where(col("vec_id") =!= 0)
    val qRow = em.where(col("vec_id") === 0)
    val exact = graft.operators.Similarity.cosineTopK(
        corpus, qRow.select(col("embedding").as("qv")),
        "vec_id", "embedding", k = 10)
      .select("vec_id").transform(Det.pin)
    val index = graft.operators.Similarity
      .ivfAssign(corpus, "vec_id", "embedding", cent)
      .transform(Det.pin)
    Seq(1, 2, 4).map { p =>
      val cells = graft.operators.Similarity
        .ivfAssign(qRow, "vec_id", "embedding", cent, probe = p)
        .select("clabel")
      index.join(broadcast(cells), "clabel")
        .join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(p).as("nprobe"), col("hits"))
    }.reduce(_ unionByName _)
      .select(col("nprobe"), col("hits"),
        Det.r4e(col("hits").cast("double") / lit(10.0))
          .as("recall_at10"))
      .transform(Det.emit(_, "nprobe"))
  }

  /** q189: PQ RECALL CALIBRATION (round 13; round 18 adds the
    * TRAINED-codebook leg — VERDICT r10 item 8) — the q143 discipline
    * ("measure the approximation, don't guess") applied to q188:
    * recall@10 of the PQ-ADC pipeline against the exact cosine
    * top-10, plus the SHORTLIST recall (did the 20-row ADC shortlist
    * even contain the true neighbours — the number that bounds what
    * any re-rank can recover) — ONE ROW PER CODEBOOK: iters=0 (the
    * hash-draw) and iters=1 (one Lloyd refinement through
    * `pqCodebook`'s loop). The delta between the rows IS the product
    * answer to "does training the codebook help on this corpus" —
    * MSE provably improves (the spec's monotone pin) while recall may
    * move either way, which is exactly why it's measured, not
    * assumed. The oracle replays the Lloyd step end-to-end (argmin
    * assignment by the same rounded-distance + j rule, per-(i,j,pos)
    * r6e'd means, empty cells keep their entry, refreshed entries
    * cast back to float32), so the trained geometry is hash-checked
    * too. Both sides exactly computable; emitted fractions are exact
    * integer divisions (class C). Everything after the top-k stages
    * is 10/20-row frames — broadcast-trivial. */
  private def q189(s: SparkSession, d: String): DataFrame = {
    val em = spread(s, embeddings(s, d))
    val q = em.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    // PIN the corpus (round 15 — VERDICT r14 item 2): the key is the
    // suite's only consumer that scans the embedding corpus SEVEN
    // times in one plan family (exact top-10, then per codebook leg a
    // hash-draw sort, a coding pass, a shortlist fetch, plus leg 1's
    // Lloyd re-center) — without the pin each pass re-reads the
    // parquet and re-runs `spread`. One materialization serves all of
    // them; the exact arm shares the same unrolled scan as the PQ
    // chain. At 100 TB this is precisely the "encode once, serve from
    // codes" split writePqIndex makes durable — the pin is the
    // in-memory form of the same single-scan discipline.
    val corpus = Det.pin(em.where(col("vec_id") =!= 0))
    val exact = Det.pin(graft.operators.Similarity.cosineTopK(
      corpus, q, "vec_id", "embedding", k = 10).select("vec_id"))
    // k = shortlist: the re-ranked output IS the ADC shortlist set,
    // and rank <= 10 recovers q188's final answer — one PQ pass
    // serves both measurements per codebook
    def leg(iters: Int): DataFrame = {
      val sl = graft.operators.Similarity.pqTopK(
        corpus, q, "vec_id", "embedding",
        dim = 64, m = 4, kc = 16, shortlist = 20, k = 20, iters = iters)
      val h10 = sl.where(col("rank") <= 10)
        .join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits10"))
      val hsl = sl.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("hits_sl"))
      h10.crossJoin(broadcast(hsl))
        .select(lit(iters).as("iters"), col("hits10"), col("hits_sl"),
          (col("hits10") / lit(10.0)).as("recall_at10"),
          (col("hits_sl") / lit(10.0)).as("shortlist_recall"))
    }
    leg(0).unionByName(leg(1)).orderBy("iters")
  }

  /** q191: IVF-PQ COMPOSED ANN (round 15 — Similarity.ivfPqSearch,
    * Jégou et al. 2011's IVFADC / the FAISS `IVFx,PQy` layout; the
    * capstone of the vector family: q84 exact, q95/q100 IVF, q188 PQ,
    * and here the two composed the way a production index actually
    * ships): label-trained IVF centroids coarse-partition the corpus,
    * the vec_id=0 query probes its top-2 cells by centroid dot score,
    * the m=4/kc=16 ADC shortlist (20) scans ONLY the probed cells'
    * codes, and exact cosine re-ranks the shortlist to the final
    * top 10. At 100 TB the per-query cost is probe/#cells of the
    * m-byte code table + `shortlist` float fetches — the corpus never
    * scans. Every stage is rounded-then-tie-broken (cell argmax
    * round(sc,6)+clabel, PQ argmin/shortlist r6e+id, re-rank r4e+id),
    * so the DuckDB oracle replays the full five-stage pipeline. */
  private def q191(s: SparkSession, d: String): DataFrame = {
    val em = spread(s, embeddings(s, d))
    val cent = graft.operators.Similarity.ivfCentroids(em, "label", "embedding")
    graft.operators.Similarity.ivfPqSearch(em, "vec_id", "embedding", cent,
        queryId = 0, dim = 64, m = 4, kc = 16, shortlist = 20, k = 10,
        probe = 2)
      .orderBy("rank")
  }

  /** q85: per-label mean vector — positional explode, then a hash
    * aggregate on (label,pos): bounded state (labels × dim). */
  private def q85(s: SparkSession, d: String): DataFrame =
    spread(s, embeddings(s, d))
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(Det.r6e(avg(col("v").cast("double"))).as("centroid"))
      .orderBy("label", "pos")

  /** q210: per-source embedding CENTROID DRIFT (round 16 — the
    * embedding-space view of q200's PSI: a source whose centroid
    * swings away from the corpus centroid is off-distribution —
    * scraper drift, language shift, synthetic contamination — before
    * any scalar feature moves): per source, the vector count, the
    * cosine of the source centroid to the GLOBAL centroid, and the
    * centroid norm (a mean that collapses toward 0 flags an
    * internally incoherent source). Scale: one vec_id-keyed
    * corpus-to-corpus equi join tags vectors with their doc's source
    * (two corpus-sized tables — a co-located SMJ is the right shape,
    * nothing to broadcast), then the (source, pos) hash aggregate
    * bounds all remaining state at #sources × dim; the global
    * centroid derives from the per-source sums (map-side over the
    * bounded frame — the corpus is never re-scanned). Floats:
    * float-sum order noise under r4e/r6e; no decisions. */
  private def q210(s: SparkSession, d: String): DataFrame = {
    val ev = embeddings(s, d)
      .join(documents(s, d).select(col("doc_id").as("vec_id"),
        col("source")), "vec_id")
      .select(col("source"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("source"), col("pos"), col("v").cast("double").as("v"))
    val per = ev.groupBy("source", "pos")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      .transform(Det.pin)
    val glob = per.groupBy("pos")
      .agg(sum("sv").as("gv"), sum("n").as("gn"))
    per.join(glob, "pos")
      .select(col("source"), col("n"),
        (col("sv") / col("n")).as("c"), (col("gv") / col("gn")).as("g"))
      .groupBy("source")
      .agg(max("n").as("n_vecs"),
        sum(col("c") * col("g")).as("dot"),
        sqrt(sum(col("c") * col("c"))).as("nc"),
        sqrt(sum(col("g") * col("g"))).as("ng"))
      .select(col("source"), col("n_vecs"),
        Det.r4e(col("dot") / (col("nc") * col("ng"))).as("cos_to_global"),
        Det.r6e(col("nc")).as("centroid_norm"))
      .transform(Det.emit(_, "source"))
  }

  /** q90: embedding-cosine near-dup pairs (cos > 0.35) within the
    * vec_id<200 block. Pairing is a bounded block (the dedup pattern:
    * shard the corpus into blocks / LSH buckets, pair within) — the
    * cross product never spans the full corpus. */
  private def q90(s: SparkSession, d: String): DataFrame =
    graft.operators.Similarity.nearDupPairs(
        spread(s, embeddings(s, d).where(col("vec_id") < 200)),
        "vec_id", "embedding", minCos = 0.35)
      .transform(Det.emit(_, "a_id", "b_id"))

  /** q95: IVF-style ANN — build label-centroids, index every vector in
    * its argmax-dot cell, then search the top-5 neighbours of vec_id=1
    * at probe=1 (only the query's own cell is scanned). The probe-k
    * generalization and its recall bound vs the exact baseline live in
    * `Similarity.ivfSearch` / OperatorSpec. */
  private def q95(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Similarity
    val spreadEm = spread(s, embeddings(s, d))
    val cent = Similarity.ivfCentroids(spreadEm, "label", "embedding")
    Similarity.ivfSearch(spreadEm, "vec_id", "embedding", cent,
      queryId = 1, k = 5, probe = 1)
  }

  /** q100: batch k-NN self-join — every anchor's top-3 neighbours via
    * IVF-cell candidate blocking (Similarity.knnJoin). Declared at
    * probe=all so the result is exact and oracle-checkable; at scale
    * the same operator runs with small probe and the recall bound
    * OperatorSpec pins for ivfSearch. Anchors restricted to
    * vec_id < 50 to keep the oracle's brute-force side tractable. */
  private def q100(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Similarity
    val em = spread(s, embeddings(s, d))
    val cent = Similarity.ivfCentroids(em, "label", "embedding")
    Similarity.knnJoin(em, "vec_id", "embedding", cent, k = 3,
        probe = Int.MaxValue, anchorFilter = Some(col("vec_id") < 50))
      .transform(Det.emit(_, "a_id", "rn"))
  }

  /** q113: random-hyperplane (SRP) LSH near-dup candidates over the
    * whole corpus — the embedding twin of the MinHash band join: 8
    * ±1-hyperplane sign bits pack into a bucket key, candidate pairs
    * come from the bucket equi-join (pair count ∝ corpus ×
    * bucket-occupancy, never corpus²), and each candidate gets its
    * exact cosine. The sign test runs over integer-quantized
    * components so every engine computes the identical bucket
    * (Similarity.rpLshBuckets). */
  private def q113(s: SparkSession, d: String): DataFrame =
    graft.operators.Similarity.rpLshPairs(
        spread(s, embeddings(s, d)), "vec_id", "embedding", bits = 8)
      .select("bucket", "a_id", "b_id", "cos_sim")
      .transform(Det.emitWide(_, "a_id", "b_id"))

  /** q114: int8 scalar quantization of the embedding column — the
    * standard 4× compression step before an ANN index ships to
    * serving: per-DIMENSION min/max over the corpus (a bounded
    * dim-sized aggregate that then broadcasts back), code =
    * floor((x−min)/scale) clamped to 255, and the per-vector mean
    * absolute reconstruction error against the bin-center dequant.
    * One corpus-linear pass + one per-vector aggregate; floor/division
    * are single IEEE ops so codes agree bit-for-bit across engines. */
  private def q114(s: SparkSession, d: String): DataFrame = {
    val ex = spread(s, embeddings(s, d))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("pos"), col("xf").cast("double").as("x"))
    val stats = ex.groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
    val sc = (col("mx") - col("mn")) / 255.0
    val code = least(floor((col("x") - col("mn")) / sc), lit(255.0))
    val deq = col("mn") + (code + 0.5) * sc
    val err = when(col("mx") === col("mn"), lit(0.0))
      .otherwise(abs(col("x") - deq))
    ex.join(broadcast(stats), "pos")
      .select(col("vec_id"), err.as("err"))
      .groupBy("vec_id").agg(Det.r6e(avg("err")).as("mae"))
      .transform(Det.emitWide(_, "vec_id"))
  }

  /** q162: MMR diversified re-rank (see `Similarity.mmrRerank`) — 4
    * query vectors (vec_id < 4), top-12 cosine candidates each, k=5
    * greedy picks at λ=0.7. The DuckDB oracle replays the greedy walk
    * as FIVE unrolled CTE stages (argmax per stage via a window over
    * the rounded scores, exclusion via anti-join on the selected set)
    * — an independent formulation of the same chain, so the
    * hash-match proves every pick and every penalty term. */
  private def q162(s: SparkSession, d: String): DataFrame = {
    val em = embeddings(s, d)
    val qs = em.where(col("vec_id") < 4)
      .select(col("vec_id").as("__qid"), col("embedding").as("__qv"))
    graft.operators.Similarity.mmrRerank(
        em.where(col("vec_id") >= 4), qs, "vec_id", "embedding",
        "__qid", "__qv", topN = 12, k = 5, lambda = 0.7)
      .transform(Det.emitWide(_, "qid", "rank"))
  }

  /** q174: hybrid-retrieval RRF fusion (reciprocal rank fusion,
    * Cormack et al.) — the standard lexical+vector ensemble step of a
    * RAG stack: BM25 top-20 for a 3-term keyword query (q112's exact
    * pipeline) fused with the cosine top-20 for the vec_id=0 query
    * embedding (q84's pipeline) by score = Σ 1/(60+rank) over the
    * lists a doc appears in; top-10 of the fused union out.
    *
    * Scale: each retriever's heavy half is its own proven plan (BM25's
    * corpus-keyed shuffles, cosine's map-side scan through
    * TakeOrderedAndProject); everything downstream is k-sized — the
    * rank windows run over 20-row frames (single-partition by
    * construction, not by accident) and the fusion join is a join of
    * two 20-row lists AQE broadcasts. Ranks sit on 4dp-rounded scores
    * with id tie-breaks, and 1/(60+rank) on an integer rank is a
    * single exact IEEE division, so both engines order identically. */
  private def q174(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lexical list: q112's BM25 formula, top-20, ranked within the
    // 20-row frame (global rank == in-frame rank for the top k)
    val terms = Seq("join", "stream", "window")
    val tk = spread(s, documents(s, d))
      .select(col("doc_id"), explode(expr(TextQueries.TOKS)).as("w"))
    val dl = tk.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = tk.where(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfw = tf.groupBy("w").agg(count(lit(1)).cast("double").as("dfw"))
    val bm = tf.join(broadcast(dfw), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n") - col("dfw") + 0.5) / (col("dfw") + 0.5) + 1.0) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .as("sc"))
      .groupBy("doc_id").agg(Det.r4e(sum("sc")).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(20)
    val rbl = bm.withColumn("rb", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)).cast("int"))
      .select("doc_id", "rb")
    // vector list: q84's cosine scan, top-20, ranked the same way
    val em = embeddings(s, d)
    val q = em.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val rvl = graft.operators.Similarity.cosineTopK(
        em.where(col("vec_id") =!= 0), q, "vec_id", "embedding", k = 20)
      .withColumn("rv", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("vec_id").asc)).cast("int"))
      .select(col("vec_id").as("doc_id"), col("rv"))
    rbl.join(rvl, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rb"), col("rv"),
        Det.r6e(coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0)) +
                coalesce(lit(1.0) / (lit(60) + col("rv")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(10)
  }

  /** q175: semantic dedup (the SemDeDup recipe, Abbas et al. 2023) —
    * embedding-space near-dup pruning WITHIN pre-assigned clusters:
    * pair docs only inside their `label` cluster (pair count ∝
    * Σ cluster² — bounded by cluster occupancy, never corpus²; at
    * 100 TB the cluster count scales with the corpus so occupancy
    * stays fixed), flag pairs with cosine ≥ 0.35, and KEEP the member
    * closest to its cluster centroid (rounded-cosine ties break to
    * the smaller id). Emits per doc: centroid cosine, in-cluster
    * near-dup partner count, and the keep/drop verdict.
    *
    * Shapes: centroid build is q85's bounded (label, pos) aggregate;
    * member→centroid scoring joins the broadcast centroid frame; the
    * pair join is label-keyed (a shuffle on the cluster key, both
    * directions kept so dominance folds as one groupBy on a_id). */
  private def q175(s: SparkSession, d: String): DataFrame =
    graft.operators.Similarity.semanticDedupVerdicts(
        spread(s, embeddings(s, d)), "vec_id", "embedding", "label",
        minCos = 0.35)
      .transform(Det.emitWide(_, "vec_id"))

  /** q181: metadata-FILTERED vector search — "top-k neighbours WHERE
    * lang = 'en' AND n_chars ≥ 200", the serving shape every vector
    * store grows into. Strategy is PRE-filter: the metadata predicate
    * is pushed into the documents parquet scan (PushedFilters,
    * plan-gated), the surviving id set semi-joins the embedding
    * corpus, and the exact cosine scan runs over the FILTERED subset
    * only — so recall w.r.t. the filtered corpus is exact by
    * construction. Post-filtering an unfiltered ANN top-k (the other
    * production strategy) under-returns when the filter is selective
    * — k survivors of a filtered top-k′ are not the filtered top-k;
    * pre-filter + brute scan is the correct exact path, and for
    * UN-selective filters the IVF machinery (q95/q100) composes the
    * same way with its recall bound. */
  private def q181(s: SparkSession, d: String): DataFrame = {
    val meta = documents(s, d)
      .where(col("lang") === "en" && col("n_chars") >= 200)
      .select(col("doc_id").as("vec_id"))
    val em = embeddings(s, d)
    val q = em.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    graft.operators.Similarity.cosineTopK(
      em.where(col("vec_id") =!= 0).join(meta, "vec_id"),
      q, "vec_id", "embedding", k = 10)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_vec_norm" -> q83, "q84_vec_cosine_topk" -> q84,
    "q188_pq_topk" -> q188, "q189_pq_recall" -> q189,
    "q219_ivf_recall_curve" -> q219,
    "q85_vec_centroid" -> q85, "q90_embed_neardup" -> q90,
    "q210_centroid_drift" -> q210,
    "q95_ann_ivf" -> q95, "q100_knn_join" -> q100,
    "q191_ivfpq_topk" -> q191,
    "q113_rp_lsh_pairs" -> q113, "q114_vec_quantize" -> q114,
    "q162_mmr_rerank" -> q162, "q174_rrf_fusion" -> q174,
    "q175_semantic_dedup" -> q175, "q181_filtered_ann" -> q181)

  /** q162's oracle: the MMR greedy walk unrolled into five CTE stages
    * (generated — each stage scores the not-yet-selected candidates
    * against the previous stage's selected set and argmaxes via a
    * window). Independent formulation of `Similarity.mmrRerank`'s
    * sequential chain; every pick and penalty must agree to 4dp. */
  private val mmrOracle: String = {
    val stages = (2 to 5).map { i =>
      s"""pick$i AS (
            SELECT qid, cid, score FROM (
              SELECT t.qid, t.cid, 0.7*t.rel - (1 - 0.7)*max(s.sim) AS score
              FROM topn t
              JOIN sel${i - 1} v ON v.qid = t.qid
              JOIN sims s ON s.qid = t.qid AND s.ci = t.cid AND s.cj = v.cid
              LEFT JOIN sel${i - 1} e ON e.qid = t.qid AND e.cid = t.cid
              WHERE e.cid IS NULL
              GROUP BY t.qid, t.cid, t.rel)
            QUALIFY row_number() OVER (PARTITION BY qid
              ORDER BY score DESC, cid) = 1),
          sel$i AS (SELECT qid, cid FROM sel${i - 1}
                    UNION ALL SELECT qid, cid FROM pick$i)"""
    }.mkString(",\n")
    val finals = (2 to 5).map { i =>
      s"""SELECT qid, CAST($i AS INT) AS rank, cid AS vec_id,
             round(score + ${Det.E4}, 4) AS score FROM pick$i"""
    }.mkString("\n UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
                   FROM embeddings WHERE vec_id < 4),
        c AS (SELECT vec_id AS cid, embedding AS cv
              FROM embeddings WHERE vec_id >= 4),
        pr AS (SELECT q.qid, c.cid,
                      unnest(list_transform(c.cv, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS y
               FROM c CROSS JOIN q),
        rm AS (SELECT qid, cid, sum(x*y) AS dot,
                      sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
               FROM pr GROUP BY qid, cid),
        reln AS (SELECT qid, cid,
                        round(dot/(na*nb) + ${Det.E4}, 4) AS rel FROM rm),
        topn AS (SELECT qid, cid, rel FROM reln
                 QUALIFY row_number() OVER (PARTITION BY qid
                   ORDER BY rel DESC, cid) <= 12),
        pp AS (SELECT a.qid, a.cid AS ci, b.cid AS cj,
                      unnest(list_transform(ca.cv, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(cb.cv, x -> CAST(x AS DOUBLE))) AS y
               FROM topn a JOIN topn b ON a.qid = b.qid AND a.cid <> b.cid
               JOIN c ca ON ca.cid = a.cid
               JOIN c cb ON cb.cid = b.cid),
        pm AS (SELECT qid, ci, cj, sum(x*y) AS dot,
                      sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
               FROM pp GROUP BY qid, ci, cj),
        sims AS (SELECT qid, ci, cj,
                        round(dot/(na*nb) + ${Det.E4}, 4) AS sim FROM pm),
        pick1 AS (SELECT qid, cid, rel AS score FROM topn
                  QUALIFY row_number() OVER (PARTITION BY qid
                    ORDER BY rel DESC, cid) = 1),
        sel1 AS (SELECT qid, cid FROM pick1),
        $stages
        SELECT qid, CAST(1 AS INT) AS rank, cid AS vec_id,
               round(score + ${Det.E4}, 4) AS score FROM pick1
        UNION ALL $finals
        ORDER BY qid, rank"""
  }

  /** The PQ oracle chain (q188/q189/q191): codebook draw + coding +
    * ADC shortlist + exact re-rank, parameterized on the `base` CTE —
    * q188 codes the whole non-query corpus, q191 codes only the
    * IVF-probed candidate cells. The codebook always draws from the
    * FULL corpus (geometry must not depend on which cells a query
    * probes — Similarity.ivfPqSearch's contract). */
  private def pqCtes(base: String): String =
    s"""cb0 AS (SELECT vec_id AS cbid, embedding AS cv,
                 CAST('0x' || substr(md5('pq:' || CAST(vec_id AS VARCHAR)), 1, 15)
                      AS BIGINT) AS h
               FROM embeddings WHERE vec_id <> 0
               ORDER BY h, cbid LIMIT 16),
         cb AS (SELECT CAST(row_number() OVER (ORDER BY h, cbid) AS INT) - 1 AS j,
                       cv FROM cb0),
         base AS ($base),
         q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         d AS (SELECT b.vec_id, s.i, cb.j,
                 round(list_sum(list_transform(range(16), t ->
                   (CAST(b.embedding[s.i*16 + t + 1] AS DOUBLE) -
                    CAST(cb.cv[s.i*16 + t + 1] AS DOUBLE)) *
                   (CAST(b.embedding[s.i*16 + t + 1] AS DOUBLE) -
                    CAST(cb.cv[s.i*16 + t + 1] AS DOUBLE))))
                   + 0.0000000123, 6) AS d2
               FROM base b CROSS JOIN cb
               CROSS JOIN (VALUES (0),(1),(2),(3)) s(i)),
         codes AS (SELECT vec_id, i, j AS code FROM (
                     SELECT *, row_number() OVER (
                       PARTITION BY vec_id, i ORDER BY d2, j) AS rn FROM d)
                   WHERE rn = 1),
         qt AS (SELECT s.i, cb.j,
                  round(list_sum(list_transform(range(16), t ->
                    (CAST(q.qv[s.i*16 + t + 1] AS DOUBLE) -
                     CAST(cb.cv[s.i*16 + t + 1] AS DOUBLE)) *
                    (CAST(q.qv[s.i*16 + t + 1] AS DOUBLE) -
                     CAST(cb.cv[s.i*16 + t + 1] AS DOUBLE))))
                    + 0.0000000123, 6) AS qd2
                FROM q CROSS JOIN cb
                CROSS JOIN (VALUES (0),(1),(2),(3)) s(i)),
         sl AS (SELECT c.vec_id, round(sum(qt.qd2) + 0.0000000123, 6) AS adc
                FROM codes c JOIN qt ON qt.i = c.i AND qt.j = c.code
                GROUP BY c.vec_id ORDER BY adc ASC, vec_id ASC LIMIT 20),
         p AS (SELECT b.vec_id, sl.adc,
                      unnest(list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS y
               FROM base b JOIN sl USING (vec_id) CROSS JOIN q),
         mtr AS (SELECT vec_id, adc, sum(x*y) AS dot,
                        sqrt(sum(x*x)) AS nx, sqrt(sum(y*y)) AS ny
                 FROM p GROUP BY vec_id, adc),
         r AS (SELECT vec_id, adc,
                      round(dot/(nx*ny) + 0.00000123, 4) AS cos_sim FROM mtr)"""

  private val PQ_CTES =
    pqCtes("SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0")

  /** q191's candidate set: the IVF half replayed (q95's CTEs,
    * centroids over the full table, round(sc,6)+clabel argmax) with
    * the query's top-2 cells, feeding the PQ chain a cell-restricted
    * base. */
  private val IVFPQ_CTES =
    s"""el AS (SELECT vec_id, label,
                CAST(unnest(range(len(embedding))) AS INT) AS pos,
                unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
              FROM embeddings),
         cent AS (SELECT label AS clabel, pos, avg(x) AS c
                  FROM el GROUP BY label, pos),
         sc AS (SELECT e.vec_id, c.clabel, sum(e.x * c.c) AS sc
                FROM el e JOIN cent c ON e.pos = c.pos
                GROUP BY e.vec_id, c.clabel),
         rnk AS (SELECT vec_id, clabel, row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY round(sc, 6) DESC, clabel ASC) AS rn
                 FROM sc),
         asg AS (SELECT vec_id, clabel FROM rnk WHERE rn = 1 AND vec_id <> 0),
         qc AS (SELECT clabel FROM rnk WHERE vec_id = 0 AND rn <= 2),
         candset AS (SELECT a.vec_id FROM asg a JOIN qc USING (clabel)),
         ${pqCtes(
      "SELECT e.vec_id, e.embedding FROM embeddings e JOIN candset USING (vec_id)")}"""

  val oracles: Map[String, String] = Map(
    "q162_mmr_rerank" -> mmrOracle,
    "q181_filtered_ann" ->
      """WITH f AS (SELECT doc_id AS vec_id FROM documents
                    WHERE lang = 'en' AND n_chars >= 200),
         q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         p AS (SELECT e.vec_id,
                      unnest(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS y
               FROM embeddings e JOIN f USING (vec_id) CROSS JOIN q
               WHERE e.vec_id <> 0),
         m AS (SELECT vec_id, sum(x*y) AS dot,
                      sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
               FROM p GROUP BY vec_id)
         SELECT vec_id, round(dot/(na*nb) + 0.00000123, 4) AS cos_sim
         FROM m ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
    "q174_rrf_fusion" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${TextQueries.TS}) AS w FROM documents),
          dl AS (SELECT doc_id, CAST(count(1) AS BIGINT) AS dl
                 FROM tk GROUP BY doc_id),
          stats AS (SELECT CAST(count(1) AS DOUBLE) AS n,
                           CAST(sum(dl) AS DOUBLE) / count(1) AS avgdl
                    FROM dl),
          tf AS (SELECT doc_id, w, CAST(count(1) AS BIGINT) AS tf
                 FROM tk WHERE w IN ('join', 'stream', 'window')
                 GROUP BY doc_id, w),
          dfw AS (SELECT w, CAST(count(1) AS DOUBLE) AS dfw FROM tf GROUP BY w),
          sc AS (SELECT doc_id,
                        ln((n - dfw + 0.5) / (dfw + 0.5) + 1.0) *
                          (tf * 2.2) /
                          (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS sc
                 FROM tf JOIN dfw USING (w) JOIN dl USING (doc_id), stats),
          bm AS (SELECT doc_id, round(sum(sc) + ${Det.E4}, 4) AS bm25
                 FROM sc GROUP BY doc_id
                 ORDER BY bm25 DESC, doc_id LIMIT 20),
          rbl AS (SELECT doc_id, CAST(row_number() OVER (
                    ORDER BY bm25 DESC, doc_id) AS INT) AS rb FROM bm),
          qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          p AS (SELECT e.vec_id,
                       unnest(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS x,
                       unnest(list_transform(qv.qv, x -> CAST(x AS DOUBLE))) AS y
                FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
          m AS (SELECT vec_id, sum(x*y) AS dot,
                       sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
                FROM p GROUP BY vec_id),
          cs AS (SELECT vec_id, round(dot/(na*nb) + ${Det.E4}, 4) AS cos_sim
                 FROM m ORDER BY cos_sim DESC, vec_id LIMIT 20),
          rvl AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (
                    ORDER BY cos_sim DESC, vec_id) AS INT) AS rv FROM cs),
          f AS (SELECT coalesce(rbl.doc_id, rvl.doc_id) AS doc_id, rb, rv
                FROM rbl FULL OUTER JOIN rvl ON rbl.doc_id = rvl.doc_id)
          SELECT doc_id, rb, rv,
                 round(coalesce(1.0/(60+rb), 0) + coalesce(1.0/(60+rv), 0)
                       + ${Det.E6}, 6) AS rrf
          FROM f
          ORDER BY rrf DESC, doc_id LIMIT 10""",
    "q175_semantic_dedup" ->
      s"""WITH el AS (SELECT vec_id, label,
                 CAST(unnest(range(len(embedding))) AS INT) AS pos,
                 unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
               FROM embeddings),
          cent AS (SELECT label AS clabel, pos, avg(x) AS c
                   FROM el GROUP BY label, pos),
          cn AS (SELECT clabel, sqrt(sum(c*c)) AS cn FROM cent GROUP BY clabel),
          csd AS (SELECT e.vec_id, e.label, sum(e.x * c.c) AS dot,
                         sqrt(sum(e.x * e.x)) AS xn
                  FROM el e JOIN cent c ON e.label = c.clabel AND e.pos = c.pos
                  GROUP BY e.vec_id, e.label),
          base AS (SELECT vec_id, csd.label,
                          round(dot/(xn*cn.cn) + ${Det.E4}, 4) AS csim
                   FROM csd JOIN cn ON csd.label = cn.clabel),
          p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                       unnest(list_transform(a.embedding, x -> CAST(x AS DOUBLE))) AS x,
                       unnest(list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS y
                FROM embeddings a JOIN embeddings b
                  ON a.label = b.label AND a.vec_id <> b.vec_id),
          m AS (SELECT a_id, b_id, sum(x*y) AS dot,
                       sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
                FROM p GROUP BY a_id, b_id),
          pr AS (SELECT a_id, b_id FROM m
                 WHERE round(dot/(na*nb) + ${Det.E4}, 4) >= 0.35),
          fl AS (SELECT pr.a_id, CAST(count(1) AS INT) AS n_dups,
                        max(CASE WHEN cb.csim > ca.csim OR
                                      (cb.csim = ca.csim AND pr.b_id < pr.a_id)
                                 THEN 1 ELSE 0 END) AS dom
                 FROM pr JOIN base ca ON pr.a_id = ca.vec_id
                         JOIN base cb ON pr.b_id = cb.vec_id
                 GROUP BY pr.a_id)
          SELECT b.vec_id, b.label, b.csim,
                 coalesce(fl.n_dups, 0) AS n_dups,
                 coalesce(fl.dom, 0) = 0 AS keep
          FROM base b LEFT JOIN fl ON b.vec_id = fl.a_id
          ORDER BY b.vec_id""",
    "q113_rp_lsh_pairs" ->
      """WITH w AS (SELECT j, i,
                CASE WHEN CAST('0x' || substr(md5('rp' || CAST(j AS VARCHAR)
                       || ':' || CAST(i AS VARCHAR)), 1, 1) AS BIGINT) % 2 = 0
                     THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS wv
              FROM range(8) a(j), range(64) b(i)),
         qx AS (SELECT vec_id, i,
                CAST(floor(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) * 1000)
                     AS BIGINT) AS x
                FROM embeddings, range(64) c(i)),
         pr AS (SELECT vec_id, j, sum(wv * x) AS p
                FROM qx JOIN w USING (i) GROUP BY vec_id, j),
         bk AS (SELECT vec_id,
                CAST(sum(CASE WHEN p >= 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                              ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
                FROM pr GROUP BY vec_id),
         cand AS (SELECT a.bucket, a.vec_id AS a_id, b.vec_id AS b_id
                  FROM bk a JOIN bk b
                  ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         p AS (SELECT c.bucket, c.a_id, c.b_id,
                      unnest(list_transform(ea.embedding, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(eb.embedding, x -> CAST(x AS DOUBLE))) AS y
               FROM cand c JOIN embeddings ea ON c.a_id = ea.vec_id
                           JOIN embeddings eb ON c.b_id = eb.vec_id),
         m AS (SELECT bucket, a_id, b_id, sum(x*y) AS dot,
                      sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
               FROM p GROUP BY bucket, a_id, b_id)
         SELECT bucket, a_id, b_id,
                round(dot/(na*nb) + 0.00000123, 4) AS cos_sim
         FROM m ORDER BY a_id, b_id""",
    "q114_vec_quantize" ->
      """WITH ex AS (SELECT vec_id,
                CAST(unnest(range(len(embedding))) AS INT) AS pos,
                unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
              FROM embeddings),
         st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM ex GROUP BY pos),
         er AS (SELECT vec_id,
                CASE WHEN mx = mn THEN 0.0
                     ELSE abs(x - (mn + (least(floor((x - mn) / ((mx - mn) / 255.0)),
                                               255.0) + 0.5)
                                        * ((mx - mn) / 255.0))) END AS err
                FROM ex JOIN st USING (pos))
         SELECT vec_id, round(avg(err) + 0.0000000123, 6) AS mae
         FROM er GROUP BY vec_id ORDER BY vec_id""",
    "q83_vec_norm" ->
      """SELECT vec_id,
                round(sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) + 0.0000000123, 6) AS l2
         FROM embeddings ORDER BY vec_id""",
    "q188_pq_topk" ->
      s"""WITH $PQ_CTES
         SELECT rank, vec_id, adc, cos_sim FROM (
           SELECT CAST(row_number() OVER (
                    ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank,
                  vec_id, adc, cos_sim
           FROM r)
         WHERE rank <= 10 ORDER BY rank""",
    "q191_ivfpq_topk" ->
      s"""WITH $IVFPQ_CTES
         SELECT rank, vec_id, adc, cos_sim FROM (
           SELECT CAST(row_number() OVER (
                    ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank,
                  vec_id, adc, cos_sim
           FROM r)
         WHERE rank <= 10 ORDER BY rank""",
    // q189's oracle shares the full PQ chain and intersects with the
    // exact top-10 (q84's formulation: r4e-rounded cosine, id
    // tie-break — the same rule cosineTopK applies)
    // q219: q95's assignment chain replayed; recall per nprobe via the
    // probe-rank inequality join on ≤10-row frames.
    "q219_ivf_recall_curve" ->
      s"""WITH el AS (SELECT vec_id, label,
                CAST(unnest(range(len(embedding))) AS INT) AS pos,
                unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
              FROM embeddings),
          cent AS (SELECT label AS clabel, pos, avg(x) AS c
                   FROM el GROUP BY label, pos),
          sc AS (SELECT e.vec_id, c.clabel, sum(e.x * c.c) AS sc
                 FROM el e JOIN cent c ON e.pos = c.pos
                 GROUP BY e.vec_id, c.clabel),
          rk AS (SELECT vec_id, clabel, row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY round(sc, 6) DESC, clabel ASC) AS rn
                 FROM sc),
          asg AS (SELECT vec_id, clabel FROM rk
                  WHERE rn = 1 AND vec_id <> 0),
          qc AS (SELECT clabel, rn FROM rk WHERE vec_id = 0 AND rn <= 4),
          q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          p AS (SELECT e.vec_id,
                       unnest(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS x,
                       unnest(list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS y
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> 0),
          m AS (SELECT vec_id, sum(x*y) AS dot,
                       sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
                FROM p GROUP BY vec_id),
          ex AS (SELECT vec_id FROM (
                   SELECT vec_id, round(dot/(na*nb) + ${Det.E4}, 4) AS cs
                   FROM m)
                 ORDER BY cs DESC, vec_id ASC LIMIT 10),
          mem AS (SELECT a.vec_id, qc.rn FROM asg a
                  JOIN qc ON a.clabel = qc.clabel
                  JOIN ex ON ex.vec_id = a.vec_id),
          pr AS (SELECT CAST(unnest([1, 2, 4]) AS INT) AS nprobe)
          SELECT pr.nprobe, CAST(count(mem.vec_id) AS BIGINT) AS hits,
                 round(CAST(count(mem.vec_id) AS DOUBLE) / 10.0
                       + ${Det.E4}, 4) AS recall_at10
          FROM pr LEFT JOIN mem ON mem.rn <= pr.nprobe
          GROUP BY pr.nprobe ORDER BY pr.nprobe""",
    "q189_pq_recall" ->
      s"""WITH $PQ_CTES,
         rr AS (SELECT vec_id, row_number() OVER (
                  ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM r),
         pex AS (SELECT e.vec_id,
                        unnest(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS x,
                        unnest(list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS y
                 FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
         mex AS (SELECT vec_id, sum(x*y) AS dot,
                        sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
                 FROM pex GROUP BY vec_id),
         ex AS (SELECT vec_id FROM mex
                ORDER BY round(dot/(na*nb) + 0.00000123, 4) DESC, vec_id ASC
                LIMIT 10),
         h10 AS (SELECT CAST(count(1) AS BIGINT) AS c
                 FROM rr JOIN ex USING (vec_id) WHERE rank <= 10),
         hsl AS (SELECT CAST(count(1) AS BIGINT) AS c
                 FROM (SELECT vec_id FROM sl) s JOIN ex USING (vec_id)),
         -- ONE LLOYD STEP over the drawn codebook (pqCodebook
         -- iters=1): assignment by the same rounded-distance + j
         -- rule the coding stage uses, per-(i, j, pos) r6e'd means,
         -- empty cells keep their entry, refreshed entries back to
         -- float32 — then the whole ADC chain again over cb1
         asg1 AS (SELECT vec_id, i, j FROM (
                    SELECT vec_id, i, j, row_number() OVER (
                      PARTITION BY vec_id, i ORDER BY d2, j) AS rn FROM d)
                  WHERE rn = 1),
         m1 AS (SELECT a.i, a.j, s.t AS pos,
                  round(avg(CAST(b.embedding[a.i*16 + s.t + 1] AS DOUBLE))
                        + 0.0000000123, 6) AS c
                FROM asg1 a JOIN base b USING (vec_id)
                CROSS JOIN (SELECT CAST(unnest(range(16)) AS INT) AS t) s
                GROUP BY a.i, a.j, s.t),
         oldpos AS (SELECT j, CAST(unnest(range(64)) AS INT) AS p,
                           unnest(list_transform(cv, x -> CAST(x AS DOUBLE))) AS old
                    FROM cb),
         cb1 AS (SELECT o.j, list(CAST(coalesce(m1.c, o.old) AS FLOAT)
                                  ORDER BY o.p) AS cv
                 FROM oldpos o LEFT JOIN m1
                   ON m1.i = o.p // 16 AND m1.pos = o.p % 16
                      AND m1.j = o.j
                 GROUP BY o.j),
         d1 AS (SELECT b.vec_id, s.i, c1.j,
                  round(list_sum(list_transform(range(16), t ->
                    (CAST(b.embedding[s.i*16 + t + 1] AS DOUBLE) -
                     CAST(c1.cv[s.i*16 + t + 1] AS DOUBLE)) *
                    (CAST(b.embedding[s.i*16 + t + 1] AS DOUBLE) -
                     CAST(c1.cv[s.i*16 + t + 1] AS DOUBLE))))
                    + 0.0000000123, 6) AS d2
                FROM base b CROSS JOIN cb1 c1
                CROSS JOIN (VALUES (0),(1),(2),(3)) s(i)),
         codes1 AS (SELECT vec_id, i, j AS code FROM (
                      SELECT *, row_number() OVER (
                        PARTITION BY vec_id, i ORDER BY d2, j) AS rn FROM d1)
                    WHERE rn = 1),
         qt1 AS (SELECT s.i, c1.j,
                   round(list_sum(list_transform(range(16), t ->
                     (CAST(q.qv[s.i*16 + t + 1] AS DOUBLE) -
                      CAST(c1.cv[s.i*16 + t + 1] AS DOUBLE)) *
                     (CAST(q.qv[s.i*16 + t + 1] AS DOUBLE) -
                      CAST(c1.cv[s.i*16 + t + 1] AS DOUBLE))))
                     + 0.0000000123, 6) AS qd2
                 FROM q CROSS JOIN cb1 c1
                 CROSS JOIN (VALUES (0),(1),(2),(3)) s(i)),
         sl1 AS (SELECT c.vec_id, round(sum(qt1.qd2) + 0.0000000123, 6) AS adc
                 FROM codes1 c JOIN qt1 ON qt1.i = c.i AND qt1.j = c.code
                 GROUP BY c.vec_id ORDER BY adc ASC, vec_id ASC LIMIT 20),
         p1 AS (SELECT b.vec_id,
                       unnest(list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS x,
                       unnest(list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS y
                FROM base b JOIN sl1 USING (vec_id) CROSS JOIN q),
         mtr1 AS (SELECT vec_id, sum(x*y) AS dot,
                         sqrt(sum(x*x)) AS nx, sqrt(sum(y*y)) AS ny
                  FROM p1 GROUP BY vec_id),
         r1 AS (SELECT vec_id,
                       round(dot/(nx*ny) + 0.00000123, 4) AS cos_sim
                FROM mtr1),
         rr1 AS (SELECT vec_id, row_number() OVER (
                   ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM r1),
         h101 AS (SELECT CAST(count(1) AS BIGINT) AS c
                  FROM rr1 JOIN ex USING (vec_id) WHERE rank <= 10),
         hsl1 AS (SELECT CAST(count(1) AS BIGINT) AS c
                  FROM (SELECT vec_id FROM sl1) s JOIN ex USING (vec_id))
         SELECT * FROM (
           SELECT CAST(0 AS INTEGER) AS iters,
                  h10.c AS hits10, hsl.c AS hits_sl,
                  CAST(h10.c AS DOUBLE) / 10 AS recall_at10,
                  CAST(hsl.c AS DOUBLE) / 10 AS shortlist_recall
           FROM h10, hsl
           UNION ALL
           SELECT CAST(1 AS INTEGER),
                  h101.c, hsl1.c,
                  CAST(h101.c AS DOUBLE) / 10, CAST(hsl1.c AS DOUBLE) / 10
           FROM h101, hsl1)
         ORDER BY iters""",
    "q84_vec_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         p AS (SELECT e.vec_id,
                      unnest(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS y
               FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
         m AS (SELECT vec_id, sum(x*y) AS dot,
                      sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
               FROM p GROUP BY vec_id)
         SELECT vec_id, round(dot/(na*nb) + 0.00000123, 4) AS cos_sim
         FROM m ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
    "q85_vec_centroid" ->
      """SELECT label, CAST(pos AS INT) AS pos,
                round(avg(v) + 0.0000000123, 6) AS centroid
         FROM (SELECT label, unnest(range(len(embedding))) AS pos,
                      unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
               FROM embeddings)
         GROUP BY label, pos ORDER BY label, pos""",
    "q210_centroid_drift" ->
      s"""WITH ev AS (SELECT d.source,
                             unnest(range(len(e.embedding))) AS pos,
                             unnest(list_transform(e.embedding,
                               x -> CAST(x AS DOUBLE))) AS v
                      FROM embeddings e
                      JOIN documents d ON d.doc_id = e.vec_id),
          per AS (SELECT source, pos, sum(v) AS sv,
                         CAST(count(1) AS BIGINT) AS n
                  FROM ev GROUP BY 1, 2),
          gl AS (SELECT pos, sum(sv) AS gv,
                        CAST(sum(n) AS BIGINT) AS gn
                 FROM per GROUP BY pos),
          cg AS (SELECT p.source, p.n, p.sv / p.n AS c, g.gv / g.gn AS g
                 FROM per p JOIN gl g USING (pos)),
          agg AS (SELECT source, max(n) AS n_vecs, sum(c * g) AS dot,
                         sqrt(sum(c * c)) AS nc, sqrt(sum(g * g)) AS ng
                  FROM cg GROUP BY source)
          SELECT source, CAST(n_vecs AS BIGINT) AS n_vecs,
                 round(dot / (nc * ng) + ${Det.E4}, 4) AS cos_to_global,
                 round(nc + ${Det.E6}, 6) AS centroid_norm
          FROM agg ORDER BY source""",
    "q90_embed_neardup" ->
      """WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
         p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                      unnest(list_transform(a.embedding, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(b.embedding, x -> CAST(x AS DOUBLE))) AS y
               FROM s a JOIN s b ON a.vec_id < b.vec_id),
         m AS (SELECT a_id, b_id, sum(x*y) AS dot,
                      sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
               FROM p GROUP BY a_id, b_id)
         SELECT a_id, b_id, round(dot/(na*nb) + 0.00000123, 4) AS cos_sim
         FROM m WHERE round(dot/(na*nb) + 0.00000123, 4) > 0.35
         ORDER BY a_id, b_id""",
    "q95_ann_ivf" ->
      """WITH el AS (SELECT vec_id, label,
                CAST(unnest(range(len(embedding))) AS INT) AS pos,
                unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
              FROM embeddings),
         cent AS (SELECT label AS clabel, pos, avg(x) AS c
                  FROM el GROUP BY label, pos),
         sc AS (SELECT e.vec_id, c.clabel, sum(e.x * c.c) AS sc
                FROM el e JOIN cent c ON e.pos = c.pos
                GROUP BY e.vec_id, c.clabel),
         asg AS (SELECT vec_id, clabel FROM (
                   SELECT vec_id, clabel, row_number() OVER (
                     PARTITION BY vec_id
                     ORDER BY round(sc, 6) DESC, clabel ASC) AS rn
                   FROM sc) WHERE rn = 1),
         qc AS (SELECT clabel FROM asg WHERE vec_id = 1),
         q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
         p AS (SELECT a.vec_id,
                      unnest(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(q.qv, x -> CAST(x AS DOUBLE))) AS y
               FROM asg a
               JOIN qc ON a.clabel = qc.clabel
               JOIN embeddings e ON a.vec_id = e.vec_id
               CROSS JOIN q
               WHERE a.vec_id <> 1),
         m AS (SELECT vec_id, sum(x*y) AS dot,
                      sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
               FROM p GROUP BY vec_id)
         SELECT vec_id, round(dot/(na*nb) + 0.00000123, 4) AS cos_sim
         FROM m ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""",
    "q100_knn_join" ->
      """WITH a AS (SELECT vec_id AS a_id, embedding AS av
                    FROM embeddings WHERE vec_id < 50),
         p AS (SELECT a.a_id, e.vec_id AS nb_id,
                      unnest(list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS x,
                      unnest(list_transform(a.av, x -> CAST(x AS DOUBLE))) AS y
               FROM a JOIN embeddings e ON e.vec_id <> a.a_id),
         m AS (SELECT a_id, nb_id, sum(x*y) AS dot,
                      sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
               FROM p GROUP BY a_id, nb_id),
         r AS (SELECT a_id, nb_id,
                      round(dot/(na*nb) + 0.00000123, 4) AS cos_sim,
                      row_number() OVER (PARTITION BY a_id
                        ORDER BY round(dot/(na*nb) + 0.00000123, 4) DESC,
                                 nb_id ASC) AS rn
               FROM m)
         SELECT a_id, CAST(rn AS INT) AS rn, nb_id, cos_sim
         FROM r WHERE rn <= 3 ORDER BY a_id, rn""")
}
