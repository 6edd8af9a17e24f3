package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable embedding-similarity operators (charter extensions,
  * SURVEY.md §2.10) over any `array<float>` vector column.
  *
  * Element arithmetic casts float→double BEFORE multiplying so every
  * engine runs the identical double pipeline; per-vector reductions
  * are sequential `aggregate()` folds (map-side, no explode).
  */
object Similarity {

  private def dbl(c: Column): Column = c.cast("double")

  /** Σ xᵢ·yᵢ in double, sequential fold — a map-side scalar. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => dbl(x) * dbl(y)), lit(0.0), (acc, v) => acc + v)

  /** L2 norm in double. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + dbl(x) * dbl(x)))

  /** Composable cosine — correct anywhere, but the folds interpret
    * per element; the hot paths below use the native codegen'd
    * CosineSim expression instead (bit-identical arithmetic). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native cosine over two column NAMES (registers the codegen'd
    * cosine_sim function on the frame's session). */
  private def nativeCosine(df: DataFrame, a: String, b: String): Column = {
    graft.functions.CosineSim.register(df.sparkSession)
    expr(s"cosine_sim(`$a`, `$b`)")
  }

  /** Brute-force cosine top-k against a ONE-ROW query frame
    * (`qv` column). The query side broadcasts (stays a pure plan — no
    * collect); scoring is map-side over the corpus; the top-k
    * short-circuits via TakeOrderedAndProject. The exact baseline an
    * ANN variant is judged against. */
  def cosineTopK(corpus: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame =
    corpus
      .crossJoin(broadcast(query))
      .select(col(idCol),
        graft.queries.Det.r4e(nativeCosine(corpus, vecCol, "qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)

  /** IVF centroids in positional long form (cluster, pos, c) from a
    * cluster-labeled corpus: one positional explode + a bounded hash
    * aggregate (clusters × dim rows) — the "training" half of an IVF
    * index, runnable on a labeled bootstrap sample at any scale. */
  def ivfCentroids(corpus: DataFrame, clusterCol: String,
      vecCol: String): DataFrame =
    corpus
      .select(col(clusterCol).as("clabel"),
        posexplode(col(vecCol)).as(Seq("pos", "xv")))
      .groupBy("clabel", "pos")
      .agg(avg(dbl(col("xv"))).as("c"))

  /** Per-vector centroid dot scores (id, clabel, sc): centroids are
    * tiny → broadcast; scoring is a positional join + hash aggregate. */
  private def centroidScores(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "xv")))
      .select(col(idCol), col("pos"), dbl(col("xv")).as("x"))
      .join(broadcast(centroids), "pos")
      .groupBy(idCol, "clabel")
      .agg(sum(col("x") * col("c")).as("sc"))

  /** Top-`probe` clusters per vector by centroid dot score. probe=1 is
    * the index-build assignment (each vector indexed in exactly its
    * argmax cell); probe>1 is the query-side fan-out of an IVF search.
    * Scores round to 6dp before the argmax so the float compare is
    * cross-engine stable, ties break on the cluster label. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, probe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pick = Window.partitionBy(idCol)
      .orderBy(round(col("sc"), 6).desc, col("clabel").asc)
    centroidScores(corpus, idCol, vecCol, centroids)
      .withColumn("rn", row_number().over(pick))
      .where(col("rn") <= probe)
      .select(col(idCol), col("clabel"))
  }

  /** One Lloyd iteration of (spherical) k-means: re-assign every
    * vector to its best centroid by dot score — the same argmax
    * `ivfAssign` uses, so "train" and "serve" agree — and recompute
    * each centroid as its cluster's mean. Input and output use
    * `ivfCentroids`' positional long form (clabel, pos, c), so
    * iterations chain and the result drops into `ivfSearch`/
    * `ivfSearchBatch` unchanged. Typical use: iterate on a bootstrap
    * sample until stable (each round = one broadcast of the tiny
    * centroid frame + one positional hash aggregate, clusters × dim
    * rows), then index the full corpus once with `ivfAssign`.
    * A cluster left empty by re-assignment disappears from the output
    * (standard Lloyd degeneracy; callers can re-seed from `centroids`
    * if the label universe must stay fixed). */
  def kmeansIterate(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    corpus
      .join(ivfAssign(corpus, idCol, vecCol, centroids), idCol)
      .select(col("clabel"), posexplode(col(vecCol)).as(Seq("pos", "xv")))
      .groupBy("clabel", "pos")
      .agg(avg(dbl(col("xv"))).as("c"))

  /** IVF ANN search: the query probes its top-`probe` cells, the
    * candidate set is the vectors INDEXED (probe=1) in those cells,
    * and the exact cosine top-k runs over candidates only — cost is
    * probe/#clusters of the corpus instead of all of it. Recall@k
    * rises with `probe` (OperatorSpec pins the fixture recall at
    * probe=1 and the exact-recovery at probe=#clusters). */
  def ivfSearch(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queryId: Long, k: Int, probe: Int = 1): DataFrame = {
    val index = ivfAssign(corpus, idCol, vecCol, centroids)
    val qRow = corpus.where(col(idCol) === queryId)
    val qCells = ivfAssign(qRow, idCol, vecCol, centroids, probe)
      .select(col("clabel").as("qc"))
    val qv = qRow.select(col(vecCol).as("qv"))
    val candidates = index
      .join(broadcast(qCells), col("clabel") === col("qc"))
      .where(col(idCol) =!= queryId)
      .select(idCol)
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
    cosineTopK(candidates, qv, idCol, vecCol, k)
  }

  /** Batch k-NN self-join: every anchor's top-k cosine neighbours,
    * with candidate generation blocked through IVF cells — each anchor
    * probes its top-`probe` cells and only meets vectors INDEXED
    * there, so the pair count is corpus × cell-occupancy × probe,
    * never corpus². probe=#clusters recovers the exact brute-force
    * result (the oracle-checked configuration); at scale probe is
    * small and recall is governed by the same bound OperatorSpec pins
    * for `ivfSearch`. Shuffles key on cell / anchor id — both
    * high-cardinality. */
  def knnJoin(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, k: Int, probe: Int = 1,
      anchorFilter: Option[Column] = None): DataFrame =
    blockedTopK(buildIvfIndex(corpus, idCol, vecCol, centroids,
        pin = false), anchorFilter.fold(corpus)(corpus.where),
      idCol, vecCol, centroids, k, probe, excludeSelf = true)

  /** Batch-query IVF search: a whole DataFrame of queries (same
    * idCol/vecCol schema as the corpus; ids must not collide
    * meaninglessly with corpus ids when `excludeSelf`) resolved to
    * per-query cosine top-k through the same cell blocking as
    * `knnJoin` — one probe assignment per query, candidates = vectors
    * INDEXED in the probed cells, pair count ∝ queries ×
    * cell-occupancy × probe. The set form of `ivfSearch` (which takes
    * one corpus-resident queryId): use this when serving a query SET —
    * per-query driver loops would plan one job per query.
    * `excludeSelf` drops candidate pairs with equal ids — pass true
    * when the query frame is drawn from the corpus itself.
    * At probe = #clusters it equals per-query `cosineTopK`
    * (OperatorSpec pins this). Output: (a_id, rn, nb_id, cos_sim). */
  def ivfSearchBatch(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queries: DataFrame, k: Int, probe: Int = 1,
      excludeSelf: Boolean = false): DataFrame =
    blockedTopK(buildIvfIndex(corpus, idCol, vecCol, centroids,
        pin = false), queries, idCol, vecCol, centroids, k, probe,
      excludeSelf)

  /** Materialized IVF index — (nb_id, clabel, nb_vec), the probe=1
    * cell assignment joined to the vectors — built ONCE and (by
    * default) pinned MEMORY_AND_DISK. A serving workload answering
    * query batch after query batch against the same corpus should
    * build this once and pass it to `ivfSearchIndexed`: the
    * assignment is a full corpus pass (centroid scoring + per-vector
    * argmax), and re-running it per batch is the q122-class mistake
    * of recomputing a loop-invariant input. Spark evicts LRU under
    * pressure and spills to disk, so pinning stays safe at indexes
    * larger than memory; `unpersist()` the returned frame when the
    * corpus version is retired. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, pin: Boolean = true): DataFrame = {
    val idx = ivfAssign(corpus, idCol, vecCol, centroids)
      .select(col(idCol).as("nb_id"), col("clabel"))
      .join(corpus.select(col(idCol).as("nb_id"), col(vecCol).as("nb_vec")), "nb_id")
    // idempotent under re-build of the same plan (bench loops): only
    // persist when the CacheManager doesn't already hold it
    if (pin && idx.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      idx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else idx
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein '98) —
    * the retrieval-diversification step between candidate generation
    * and prompt assembly: from each query's `topN` highest-cosine
    * candidates, greedily select `k` maximizing
    *
    *   λ·rel(q, c) − (1−λ)·max_{s ∈ selected} sim(c, s)
    *
    * so near-duplicate passages don't crowd out coverage. Returns
    * (qid, rank, vec_id, score); rank 1's score is its relevance (the
    * penalty term has no selected set yet).
    *
    * Scale shape: the query frame broadcasts (queries are few by
    * contract); relevance is one map-side codegen'd cosine pass over
    * the corpus; the per-query top-N short-circuits through the
    * rank-limit window (WindowGroupLimit — bounded state, no global
    * sort); pair similarities and the greedy walk run on N rows and
    * N² sims PER QUERY — bounded by topN, independent of corpus size.
    * The walk itself is the textbook non-associative sequential
    * chain (each pick changes every later score), so it runs as a
    * typed flatMap over one packed row per query — never more than
    * #queries rows leave the bounded stage. Decisions compare doubles
    * derived from 4dp-ROUNDED rel/sim inputs with identical
    * arithmetic on every engine, ties break on the candidate id —
    * fully deterministic (the q158 discipline), which is what lets a
    * DuckDB oracle replay the walk stage by stage. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, qvecCol: String,
      topN: Int, k: Int, lambda: Double): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.CosineSim.register(s)
    val mu = 1.0 - lambda
    val rels = corpus.crossJoin(broadcast(queries))
      .select(col(qidCol).cast("long").as("qid"),
        col(idCol).cast("long").as("cid"), col(vecCol).as("cv"),
        graft.queries.Det.r4e(expr(s"cosine_sim(`$vecCol`, `$qvecCol`)"))
          .as("rel"))
    val w = Window.partitionBy("qid")
      .orderBy(col("rel").desc, col("cid").asc)
    val topn = graft.queries.Det.pin(
      rels.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= topN).drop("__rn"))
    val a = topn.select(col("qid"), col("cid").as("ci"), col("cv").as("av"))
    val b = topn.select(col("qid").as("__qid2"), col("cid").as("cj"),
      col("cv").as("bv"))
    val sims = a.join(b,
        col("qid") === col("__qid2") && col("ci") =!= col("cj"))
      .select(col("qid"), col("ci"), col("cj"),
        graft.queries.Det.r4e(expr("cosine_sim(`av`, `bv`)")).as("sim"))
    val packedR = topn.groupBy("qid").agg(collect_list(
      struct(col("cid").as("_1"), col("rel").as("_2"))).as("cands"))
    val packedS = sims.groupBy("qid").agg(collect_list(
      struct(col("ci").as("_1"), col("cj").as("_2"),
        col("sim").as("_3"))).as("sims"))
    val walked = packedR.join(packedS, Seq("qid"))
      .select(col("qid").cast("long"), col("cands"), col("sims"))
      .as[(Long, Seq[(Long, Double)], Seq[(Long, Long, Double)])]
      .flatMap { case (qid, cands, simRows) =>
        val simOf = simRows.map { case (x, y, v) => ((x, y), v) }.toMap
        val byScore = cands.sortBy { case (id, r) => (-r, id) }
        val first = byScore.head
        var selected = Vector(first._1)
        var out = Vector((qid, 1, first._1, first._2))
        var remaining = byScore.tail.toVector
        for (step <- 2 to math.min(k, cands.size)) {
          val scored = remaining.map { case (id, r) =>
            val ms = selected
              .map(sid => simOf.getOrElse((id, sid), 0.0)).max
            (id, lambda * r - mu * ms)
          }
          val (pid, pscore) = scored.minBy { case (id, sc) => (-sc, id) }
          selected = selected :+ pid
          out = out :+ ((qid, step, pid, pscore))
          remaining = remaining.filter(_._1 != pid)
        }
        out
      }
    walked.toDF("qid", "rank", "vec_id", "score")
      .withColumn("score", graft.queries.Det.r4e(col("score")))
  }

  /** Persist a `buildIvfIndex` frame to parquet — the across-SESSION
    * form of the pin: a serving deployment builds the index once
    * (full corpus pass) and every later session `readIvfIndex`s it
    * back instead of re-assigning the corpus. The layout is
    * cell-partitioned (`partitionBy(clabel)`), so a probe that knows
    * its cells could even prune the scan by directory; results
    * through a reloaded index are identical to the in-memory one
    * (spec-pinned). */
  def writeIvfIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("clabel").parquet(path)

  def readIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      pin: Boolean = true): DataFrame = {
    val idx = spark.read.parquet(path)
      .select(col("nb_id"), col("clabel"), col("nb_vec"))
    if (pin && idx.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      idx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else idx
  }

  /** `ivfSearchBatch` against a prebuilt `buildIvfIndex` frame —
    * identical results (OperatorSpec pins it), none of the per-batch
    * index rebuild. */
  def ivfSearchIndexed(index: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queries: DataFrame, k: Int, probe: Int = 1,
      excludeSelf: Boolean = false): DataFrame =
    blockedTopK(index, queries, idCol, vecCol, centroids, k, probe,
      excludeSelf)

  /** Shared cell-blocked top-k core of `knnJoin`/`ivfSearchBatch`:
    * anchors probe their top-`probe` cells and only meet vectors
    * INDEXED (probe=1) there. Shuffles key on cell / anchor id — both
    * high-cardinality. `index` is a `buildIvfIndex` frame. */
  private def blockedTopK(index: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, centroids: DataFrame, k: Int,
      probe: Int, excludeSelf: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = ivfAssign(anchors, idCol, vecCol, centroids, probe)
      .select(col(idCol).as("a_id"), col("clabel"))
      .join(anchors.select(col(idCol).as("a_id"), col(vecCol).as("a_vec")), "a_id")
    graft.functions.CosineSim.register(index.sparkSession)
    val paired = queries.join(index, "clabel")
    val scored = (if (excludeSelf) paired.where(col("a_id") =!= col("nb_id"))
      else paired)
      // an anchor probing p cells can meet an indexed vector once per
      // cell only if it were indexed multiply — index is probe=1, so
      // pairs are already unique
      .select(col("a_id"), col("nb_id"),
        graft.queries.Det.r4e(expr("cosine_sim(a_vec, nb_vec)")).as("cos_sim"))
    // rank-filter top-k per anchor: WindowGroupLimit pre-trims each
    // map task to its local k before the anchor-keyed shuffle
    val w = Window.partitionBy("a_id")
      .orderBy(col("cos_sim").desc, col("nb_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("a_id"), col("rn"), col("nb_id"), col("cos_sim"))
  }

  /** All pairs with cosine above `minCos` WITHIN a bounded block (an
    * LSH bucket, an IVF cell, a shard) — the blocked-pairing pattern:
    * the cross product never spans the full corpus. */
  def nearDupPairs(block: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame = {
    val a = block.select(col(idCol).as("a_id"), col(vecCol).as("a_emb"))
    val b = block.select(col(idCol).as("b_id"), col(vecCol).as("b_emb"))
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.queries.Det.r4e(nativeCosine(block, "a_emb", "b_emb")).as("cos_sim"))
      .where(col("cos_sim") > minCos)
  }

  /** Cluster-scoped near-dup pairs, BOTH directions (a_id ≠ b_id) —
    * the SemDeDup pairing step (q175). The join is a plain equi-join
    * on the cluster key: a shuffle on both sides, pair fan-out ∝
    * Σ cluster-size², so no side needs to broadcast and the operator
    * scales with cluster OCCUPANCY, not corpus size (at 100 TB the
    * cluster count grows with the corpus and occupancy stays fixed —
    * the SemDeDup design point). Both directions are kept so a
    * per-member dominance/partner fold is ONE groupBy on a_id. */
  def clusterDupPairs(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, minCos: Double): DataFrame = {
    val a = df.select(col(clusterCol).as("__cl"), col(idCol).as("a_id"),
      col(vecCol).as("a_emb"))
    val b = df.select(col(clusterCol).as("__cl"), col(idCol).as("b_id"),
      col(vecCol).as("b_emb"))
    a.join(b, Seq("__cl"))
      .where(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        graft.queries.Det.r4e(nativeCosine(df, "a_emb", "b_emb")).as("cos_sim"))
      .where(col("cos_sim") >= minCos)
  }

  /** SemDeDup verdicts (q175; also CleanCorpus stage 2c): per member
    * of a pre-clustered embedding corpus — centroid cosine `csim`,
    * in-cluster near-dup partner count `n_dups` (pair cosine ≥
    * `minCos`, both rounded), and `keep` = not DOMINATED (a partner
    * with strictly higher csim, rounded ties to the smaller id). A
    * pair's two members are totally ordered by (csim, −id), so of any
    * qualifying pair exactly one side is dominated — the retained set
    * never contains a within-cluster pair at or above the threshold
    * (spec-pinned). Shapes: bounded centroid/norm aggregates
    * broadcast back; the pair join is cluster-keyed (clusterDupPairs);
    * dominance folds as one groupBy on a_id. */
  def semanticDedupVerdicts(em: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, minCos: Double): DataFrame = {
    import graft.queries.Det
    val base0 = em.select(col(idCol).as("vec_id"),
      col(clusterCol).as("label"), col(vecCol).as("embedding"))
    val cent = ivfCentroids(base0, "label", "embedding")
      .transform(Det.pin)
    val cnorm = cent.groupBy("clabel")
      .agg(sqrt(sum(col("c") * col("c"))).as("cn"))
    val ex = base0.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), col("label"), col("pos"),
        col("xf").cast("double").as("x"))
    val base = ex.join(broadcast(cent),
        col("label") === col("clabel") && ex("pos") === cent("pos"))
      .groupBy("vec_id", "label")
      .agg(sum(col("x") * col("c")).as("dot"),
        sqrt(sum(col("x") * col("x"))).as("xn"))
      .join(broadcast(cnorm), col("label") === col("clabel"))
      .select(col("vec_id"), col("label"),
        Det.r4e(col("dot") / (col("xn") * col("cn"))).as("csim"))
      .transform(Det.pin)
    val pairs = clusterDupPairs(base0, "vec_id", "embedding",
      "label", minCos)
    val flags = pairs
      .join(base.select(col("vec_id").as("a_id"), col("csim").as("ca")), "a_id")
      .join(base.select(col("vec_id").as("b_id"), col("csim").as("cb")), "b_id")
      .groupBy("a_id")
      .agg(count(lit(1)).cast("int").as("n_dups"),
        max(when(col("cb") > col("ca") ||
                 (col("cb") === col("ca") && col("b_id") < col("a_id")),
          1).otherwise(0)).as("dom"))
    base.join(flags, col("vec_id") === col("a_id"), "left")
      .select(col("vec_id"), col("label"), col("csim"),
        coalesce(col("n_dups"), lit(0)).as("n_dups"),
        (coalesce(col("dom"), lit(0)) === 0).as("keep"))
  }

  /** Random-hyperplane (SRP / "SimHash for vectors") LSH bucket id per
    * vector: `bits` signed projections onto ±1 hyperplanes, packed into
    * one BIGINT bucket key. Candidate generation is then a plain
    * equi-join on the bucket — the embedding twin of the MinHash band
    * join, and the standard linear-ish near-dup path at corpus scale
    * (all-pairs cosine is corpus² and never runs).
    *
    * Replayability over float whims: hyperplane weights are md5-parity
    * ±1 seeded by (bit, dim) — computed ONCE driver-side (O(bits×dims)
    * metadata, same budget class as the house quantile arrays) and
    * embedded as a literal matrix, so per-row work is a pure
    * multiply-add with no hashing. The projection runs over
    * `floor(x·1000)` INTEGER-quantized components, so the sign test is
    * exact integer arithmetic: any engine (and any summation order)
    * produces the identical bucket, with no sign-flip-at-epsilon
    * boundary for a float accumulator to land on. Entirely map-side
    * codegen; the only shuffle is the bucket join downstream.
    *
    * `dims` must equal the embedding length — enforced per row below:
    * a zip_with length mismatch pads with nulls, the fold turns the
    * projection null, and every affected bit would silently fall to 0
    * (wrong buckets, no error), so mismatch raises instead. */
  def rpLshBuckets(corpus: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8, dims: Int = 64, carry: Seq[String] = Nil): DataFrame = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
    // weight w(j,i) = parity of the first md5 hex digit of "rp<j>:<i>"
    // → ±1; the DuckDB twin recomputes the same matrix in SQL.
    val wts: Seq[Seq[Long]] = (0 until bits).map { j =>
      (0 until dims).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rp$j:$i".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
      }
    }
    val qv = transform(col(vecCol),
      x => floor(x.cast("double") * lit(1000)).cast("long"))
    // fail loudly on a dims mismatch instead of hashing to bucket 0
    val guarded = when(size(col(vecCol)) === dims, qv)
      .otherwise(raise_error(concat(
        lit(s"rpLshBuckets: dims=$dims but $vecCol has length "),
        size(col(vecCol)).cast("string"))))
    val sized = corpus
      .select(col(idCol) +: col(vecCol) +: guarded.as("__qv") +:
        carry.map(col): _*)
    val bucket = (0 until bits).map { j =>
      val proj = aggregate(
        zip_with(typedLit(wts(j)), col("__qv"), (w, x) => w * x),
        lit(0L), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    sized.select(col(idCol) +: col(vecCol) +: bucket.as("bucket") +:
      carry.map(col): _*)
  }

  /** Candidate near-dup pairs sharing an SRP bucket, scored with exact
    * cosine: bucket-keyed self-join (linear-ish: pair count ∝ corpus ×
    * bucket occupancy), never corpus². More `bits` → smaller buckets →
    * higher precision / lower recall; production stacks several bucket
    * tables (seed param) exactly like MinHash LSH bands. */
  def rpLshPairs(corpus: DataFrame, idCol: String, vecCol: String,
      bits: Int = 8): DataFrame = {
    val sigs = rpLshBuckets(corpus, idCol, vecCol, bits)
    val a = sigs.select(col("bucket"), col(idCol).as("a_id"), col(vecCol).as("a_emb"))
    val b = sigs.select(col("bucket"), col(idCol).as("b_id"), col(vecCol).as("b_emb"))
    a.join(b, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("bucket"), col("a_id"), col("b_id"),
        graft.queries.Det.r4e(nativeCosine(sigs, "a_emb", "b_emb")).as("cos_sim"))
  }

  /** PRODUCT-QUANTIZATION search with ADC + exact re-rank (q188) —
    * the memory-bound ANN serving path (Jégou et al. 2011, "Product
    * quantization for nearest neighbor search"): vectors compress to
    * `m` small codes (one per subspace), query-time distance is m
    * table lookups instead of a dim-wide float scan, and the exact
    * score runs only on the ADC shortlist — at 100 TB the full float
    * corpus never leaves disk for a query; only the m-byte code
    * table (16–64× smaller) scans.
    *
    *  1. CODEBOOK: `kc` hash-chosen corpus vectors per the house
    *     deterministic-draw rule (production PQ trains k-means
    *     codebooks OFFLINE on a sample; codebook QUALITY is a
    *     training concern — the engine's job, codes + ADC + re-rank,
    *     is identical and is what this operator pins). kc rows —
    *     broadcast everywhere.
    *  2. CODES: per subspace i, code = argmin_j ‖subvec − c_j^(i)‖²
    *     — one map-side pass over corpus × (broadcast kc), distances
    *     as sequential double folds rounded r6e (Det discipline),
    *     ties to the smaller j.
    *  3. ADC: the query's kc×m distance table (1-row cross — tiny)
    *     joins the codes on (i, j); per-vector approx distance =
    *     Σ_i table[i, code_i]; `shortlist` smallest short-circuit
    *     through TakeOrderedAndProject on (r6e distance, id).
    *  4. RE-RANK: exact cosine on the shortlist only → top `k`.
    *
    * Returns (rank, idCol, adc, cos_sim). Every float that feeds a
    * decision (argmin, shortlist order, final order) is rounded
    * first with id/index tie-breaks — the class-E determinism
    * discipline, which is what lets a DuckDB oracle replay all four
    * stages. */
  /** Subspace-i squared L2 between two vector columns: sequential
    * double fold over the sliced range (identical op sequence on
    * both engines, the q162 discipline). */
  private def pqDist2(a: String, b: String, i: Int, sub: Int): Column = expr(
    s"""aggregate(zip_with(slice(`$a`, ${i * sub + 1}, $sub),
                           slice(`$b`, ${i * sub + 1}, $sub),
          (x, y) -> (cast(x as double) - cast(y as double)) *
                    (cast(x as double) - cast(y as double))),
        cast(0 as double), (acc, v) -> acc + v)""")

  /** Per-(vector, subspace) distances to every codebook entry:
    * (idCol, i, j, d2) — one map-side pass over corpus × broadcast
    * codebook, d2 rounded r6e so the downstream argmin is
    * cross-engine deterministic with the j tie-break. */
  private[graft] def pqStack(corpus: DataFrame, cb: DataFrame, idCol: String,
      vecCol: String, m: Int, sub: Int): DataFrame = {
    val Det = graft.queries.Det
    corpus.crossJoin(broadcast(cb))
      .select(col(idCol), col("j"), explode(array((0 until m).map(i =>
        struct(lit(i).as("i"), Det.r6e(pqDist2(vecCol, "cv", i, sub)).as("d2"))): _*))
        .as("s"))
      .select(col(idCol), col("s.i").as("i"), col("j"), col("s.d2").as("d2"))
  }

  /** The PQ codebook: `kc` hash-drawn corpus vectors (the house
    * deterministic-draw rule), optionally refined by `iters` Lloyd
    * k-means steps per subspace — assign every subvector to its
    * nearest centroid (rounded distance + j tie-break, the same
    * argmin rule the coding stage uses), re-center each (subspace,
    * centroid) cell as the positional mean, rebuild the packed
    * vectors; a cell no subvector chose keeps its previous value
    * (the standard empty-cell rule). All refinement state is
    * bounded: assignments reduce to an (id, i) argmin, re-centering
    * is an m × kc × sub hash aggregate. Returns (j, cv).
    *
    * NOTE (measured, q189's whole point): a Lloyd step provably
    * does not increase the QUANTIZATION error (`pqQuantError`, spec-
    * pinned) but recall@shortlist on a given query may still move
    * either way — MSE and recall are different objectives; calibrate
    * with q189 before turning this knob in production. */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, kc: Int, salt: String = "pq",
      iters: Int = 0): DataFrame = {
    require(dim % m == 0, s"pqCodebook: dim $dim not divisible by m $m")
    val sub = dim / m
    import org.apache.spark.sql.expressions.Window
    val Det = graft.queries.Det
    val drawn = corpus.select(col(idCol).as("__cbid"), col(vecCol).as("cv"),
      expr(s"""cast(conv(substring(md5(concat('$salt:',
             cast(`$idCol` as string))), 1, 15), 16, 10) as bigint)""")
        .as("__h"))
      .orderBy(col("__h"), col("__cbid")).limit(kc)
    var cb = drawn.select(
      (row_number().over(Window.orderBy(col("__h"), col("__cbid"))) - 1)
        .as("j"), col("cv"))
    for (_ <- 1 to iters) {
      val asg = corpus.crossJoin(broadcast(cb))
        .select(col(idCol), col("j"), col(vecCol).as("__v"),
          explode(array((0 until m).map(i =>
            struct(lit(i).as("i"), Det.r6e(pqDist2(vecCol, "cv", i, sub)).as("d2"))): _*))
            .as("s"))
        .select(col(idCol), col("s.i").as("i"), col("j"), col("s.d2").as("d2"),
          col("__v"))
        .groupBy(idCol, "i")
        .agg(min(struct(col("d2"), col("j"))).as("mn"), first(col("__v")).as("__v"))
        .select(col("i"), col("mn.j").as("j"),
          expr(s"slice(__v, i * $sub + 1, $sub)").as("sv"))
      val means = asg
        .select(col("i"), col("j"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("i", "j", "pos")
        .agg(Det.r6e(avg(col("x").cast("double"))).as("c"))
      val refreshed = cb
        .select(col("j"), posexplode(col("cv")).as(Seq("__p", "__old")))
        .select(col("j"), col("__p"),
          (col("__p") / sub).cast("int").as("i"), (col("__p") % sub).as("pos"),
          col("__old").cast("double").as("old"))
        .join(means, Seq("i", "j", "pos"), "left")
        .groupBy("j")
        .agg(expr(
          "transform(array_sort(collect_list(struct(__p, coalesce(c, old) as x))), s -> cast(s.x as float))")
          .as("cv"))
      cb = Det.pin(refreshed)
    }
    cb
  }

  /** The k-means objective the codebook refinement optimizes: mean
    * over (vector, subspace) of the squared distance to the NEAREST
    * codebook entry. A Lloyd step does not increase it (up to the
    * r6e rounding grid and float-mean noise — the spec allows 1e-6);
    * recall is a different objective (see pqCodebook note). */
  def pqQuantError(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, kc: Int, salt: String = "pq",
      iters: Int = 0): Double = {
    val cb = pqCodebook(corpus, idCol, vecCol, dim, m, kc, salt, iters)
    pqStack(corpus, cb, idCol, vecCol, m, dim / m)
      .groupBy(col(idCol), col("i")).agg(min("d2").as("mind"))
      .agg(avg("mind")).head().getDouble(0)
  }

  /** The query's ADC lookup table: kc × m rows (i, j, qd2), r6e
    * distances — broadcast into the code join. */
  private[graft] def pqQueryTable(query: DataFrame, cb: DataFrame,
      m: Int, sub: Int): DataFrame = {
    val Det = graft.queries.Det
    query.select(col("qv")).crossJoin(broadcast(cb))
      .select(col("j"), explode(array((0 until m).map(i =>
        struct(lit(i).as("i"), Det.r6e(pqDist2("qv", "cv", i, sub)).as("qd2"))): _*))
        .as("s"))
      .select(col("s.i").as("i"), col("j"), col("s.qd2").as("qd2"))
  }

  /** ADC shortlist + exact re-rank, given per-(id, i) codes. */
  private[graft] def pqServe(codes: DataFrame, qtable: DataFrame,
      corpus: DataFrame, query: DataFrame, idCol: String, vecCol: String,
      shortlist: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Det = graft.queries.Det
    val short = codes
      .join(broadcast(qtable), codes("i") === qtable("i") &&
        codes("code") === qtable("j"))
      .groupBy(idCol).agg(Det.r6e(sum("qd2")).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(shortlist)
    // exact re-rank over the shortlist only
    graft.functions.CosineSim.register(corpus.sparkSession)
    short.join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .crossJoin(broadcast(query.select(col("qv"))))
      .select(col(idCol), col("adc"),
        Det.r4e(expr(s"cosine_sim(`$vecCol`, `qv`)")).as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos_sim").desc, col(idCol).asc)).cast("int"))
      .where(col("rank") <= k)
      .select(col("rank"), col(idCol), col("adc"), col("cos_sim"))
  }

  def pqTopK(corpus: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, kc: Int, shortlist: Int, k: Int,
      salt: String = "pq", iters: Int = 0): DataFrame = {
    require(dim % m == 0, s"pqTopK: dim $dim not divisible by m $m")
    require(shortlist >= k, s"pqTopK: shortlist $shortlist < k $k")
    val sub = dim / m
    val cb = pqCodebook(corpus, idCol, vecCol, dim, m, kc, salt, iters)
    // codes: one map-side pass, then the bounded (id, i) argmin
    val codes = pqStack(corpus, cb, idCol, vecCol, m, sub)
      .groupBy(idCol, "i")
      .agg(min(struct(col("d2"), col("j"))).as("mn"))
      .select(col(idCol), col("i"), col("mn.j").as("code"))
    pqServe(codes, pqQueryTable(query, cb, m, sub), corpus, query,
      idCol, vecCol, shortlist, k)
  }

  /** PERSISTED PQ index — the serving artifact (writeIvfIndex's PQ
    * sibling): the encode pass over the float corpus runs ONCE and
    * lands `path/codebook` (kc packed vectors — KBs) plus
    * `path/codes` (one array<int> of length m per vector — the
    * m-byte-per-vector table that is the entire point of PQ: at
    * 100 TB of floats the codes are 16–64× smaller, and a query
    * scans ONLY them). `_pq_meta` records (dim, m, kc) the way the
    * CMS store records its shape: probing a PQ store with a
    * different geometry would silently join zero cells, so
    * `pqSearchIndexed` reads the geometry from the store and fails
    * fast if the codebook on disk disagrees. */
  def writePqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, kc: Int, path: String,
      salt: String = "pq", iters: Int = 0): Unit = {
    val cb = pqCodebook(corpus, idCol, vecCol, dim, m, kc, salt, iters)
    cb.coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    pqStack(corpus, cb, idCol, vecCol, m, dim / m)
      .groupBy(idCol, "i")
      .agg(min(struct(col("d2"), col("j"))).as("mn"))
      .select(col(idCol), col("i"), col("mn.j").as("c"))
      .groupBy(idCol)
      .agg(expr(
        "transform(array_sort(collect_list(struct(i, c))), s -> cast(s.c as int))")
        .as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes")
    val p = new org.apache.hadoop.fs.Path(path, "_pq_meta")
    val fs = p.getFileSystem(corpus.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$dim $m $kc".getBytes("UTF-8")) finally out.close()
  }

  /** Query a persisted PQ index: the ADC shortlist comes from the
    * STORED codes (the float corpus is touched only to fetch the
    * `shortlist` re-rank vectors). Geometry comes from `_pq_meta`;
    * results are identical to the in-memory `pqTopK` at the same
    * build parameters (spec-pinned). */
  def pqSearchIndexed(corpus: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, path: String, shortlist: Int, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val metaP = new org.apache.hadoop.fs.Path(path, "_pq_meta")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaP), s"pqSearchIndexed: no _pq_meta at $path")
    val in = fs.open(metaP)
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Array(dim, m, kc) = meta.trim.split("\\s+").map(_.toInt)
    val cb = spark.read.parquet(s"$path/codebook")
    val nCb = cb.count()
    require(nCb == kc,
      s"pqSearchIndexed: codebook at $path has $nCb entries, _pq_meta says $kc")
    val codes = spark.read.parquet(s"$path/codes")
      .select(col(idCol), posexplode(col("codes")).as(Seq("i", "code")))
    pqServe(codes, pqQueryTable(query, cb, m, dim / m), corpus, query,
      idCol, vecCol, shortlist, k)
  }

  /** IVF-PQ ANN — the COMPOSED serving architecture (Jégou et al.
    * 2011's IVFADC, the FAISS `IVFx,PQy` layout): the corpus is
    * coarsely partitioned into IVF cells (`ivfAssign`, probe=1) and
    * PQ-coded; a query probes its top-`probe` cells by centroid dot
    * score and the ADC shortlist runs over the codes OF THOSE CELLS
    * ONLY, then exact cosine re-ranks the shortlist. This is what
    * actually serves at 100 TB: per query the engine touches
    * probe/#cells of the m-byte code table (itself 16–64× smaller
    * than the floats) and fetches only `shortlist` float vectors for
    * the re-rank — neither the float corpus nor even the full code
    * table scans. Candidate codes are computed here for the probed
    * cells only: a vector's code depends only on the codebook, so
    * coding the candidates is equivalent to slicing a precomputed
    * code table (the persisted form composes `writePqIndex` with a
    * cell column). Centroids are caller-supplied (`ivfCentroids` /
    * `kmeansIterate` on a bootstrap sample — the training knob);
    * the codebook is the house hash-draw over the full corpus so its
    * geometry is independent of which cells a query probes.
    * Determinism: cell argmax = round(sc,6) + clabel tie-break
    * (`ivfAssign`'s rule); PQ stages r6e/r4e + id tie-breaks exactly
    * as `pqTopK` — every stage replays in the DuckDB oracle (q191). */
  def ivfPqSearch(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queryId: Long, dim: Int, m: Int, kc: Int,
      shortlist: Int, k: Int, probe: Int = 1, salt: String = "pq",
      iters: Int = 0): DataFrame = {
    require(dim % m == 0, s"ivfPqSearch: dim $dim not divisible by m $m")
    require(shortlist >= k, s"ivfPqSearch: shortlist $shortlist < k $k")
    val sub = dim / m
    val rest = corpus.where(col(idCol) =!= queryId)
    val index = ivfAssign(rest, idCol, vecCol, centroids)
    val qRow = corpus.where(col(idCol) === queryId)
    val qCells = ivfAssign(qRow, idCol, vecCol, centroids, probe)
      .select(col("clabel").as("qc"))
    val cand = index.join(broadcast(qCells), col("clabel") === col("qc"))
      .select(idCol)
      .join(rest.select(col(idCol), col(vecCol)), Seq(idCol))
    val cb = pqCodebook(rest, idCol, vecCol, dim, m, kc, salt, iters)
    val codes = pqStack(cand, cb, idCol, vecCol, m, sub)
      .groupBy(idCol, "i")
      .agg(min(struct(col("d2"), col("j"))).as("mn"))
      .select(col(idCol), col("i"), col("mn.j").as("code"))
    val qv = qRow.select(col(vecCol).as("qv"))
    pqServe(codes, pqQueryTable(qv, cb, m, sub), cand, qv,
      idCol, vecCol, shortlist, k)
  }

  /** Encode `corpus` against a FIXED (codebook, centroids) geometry:
    * (idCol, codes array<int> of length m, clabel). The shared encode
    * primitive of `writeIvfPqIndex` (one-shot) and
    * `examples.IncrementalIvfPq` (per-diff): a vector's code and cell
    * depend ONLY on the stored geometry, never on the rest of the
    * corpus, which is exactly what makes the codes store incrementally
    * maintainable — encoding a diff with the stored geometry produces
    * the same rows a full re-encode would (spec-pinned row-for-row).
    * All stages bounded: one map-side pass over corpus × broadcast
    * codebook, an (id, i) argmin, a broadcast-centroid assign. */
  private[graft] def encodeCodes(corpus: DataFrame, cb: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, m: Int,
      sub: Int): DataFrame = {
    val asg = ivfAssign(corpus, idCol, vecCol, centroids)
    pqStack(corpus, cb, idCol, vecCol, m, sub)
      .groupBy(idCol, "i")
      .agg(min(struct(col("d2"), col("j"))).as("mn"))
      .select(col(idCol), col("i"), col("mn.j").as("c"))
      .groupBy(idCol)
      .agg(expr(
        "transform(array_sort(collect_list(struct(i, c))), s -> cast(s.c as int))")
        .as("codes"))
      .join(asg, Seq(idCol))
      .select(col(idCol), col("codes"), col("clabel"))
  }

  /** PERSISTED IVF-PQ index — the serving artifact `ivfPqSearch`
    * models (writePqIndex's cell-partitioned sibling). Layout:
    *
    *   path/centroids          (clabel, pos, c) — cells × dim rows, KBs
    *   path/codebook           (j, cv)          — kc packed vectors, KBs
    *   path/codes/clabel=<c>/  (id, codes array<int> of length m)
    *   path/_ivfpq_meta        "dim m kc"
    *
    * `codes` is PARTITIONED BY the IVF cell, so a probed query reads
    * only its cells' directories — the probe/#cells I/O claim becomes
    * literal partition pruning in the FileScan (OperatorSpec asserts
    * the served plan's input files all come from probed `clabel=`
    * dirs). `_ivfpq_meta` follows the CMS-store discipline: geometry
    * drift would silently join zero ADC cells, so reads fail fast. */
  def writeIvfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, dim: Int, m: Int, kc: Int, path: String,
      salt: String = "pq", iters: Int = 0): Unit = {
    require(dim % m == 0, s"writeIvfPqIndex: dim $dim not divisible by m $m")
    val cb = pqCodebook(corpus, idCol, vecCol, dim, m, kc, salt, iters)
    cb.coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    encodeCodes(corpus, cb, centroids, idCol, vecCol, m, dim / m)
      .write.mode("overwrite").partitionBy("clabel").parquet(s"$path/codes")
    val p = new org.apache.hadoop.fs.Path(path, "_ivfpq_meta")
    val fs = p.getFileSystem(corpus.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$dim $m $kc".getBytes("UTF-8")) finally out.close()
  }

  /** Query a persisted IVF-PQ index: centroids (KBs) pick the query's
    * top-`probe` cells; the cell labels — ≤ probe ints, the house
    * metadata-sized collect — become a partition-pruning IN filter on
    * the `codes` read, so ONLY the probed directories scan; ADC +
    * exact re-rank then run exactly as `ivfPqSearch` (spec-pinned
    * identical at the same build parameters). `corpus` is touched
    * only for the `shortlist` re-rank vectors. */
  def ivfPqSearchIndexed(corpus: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, path: String, shortlist: Int, k: Int,
      probe: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    val metaP = new org.apache.hadoop.fs.Path(path, "_ivfpq_meta")
    val fs = metaP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaP), s"ivfPqSearchIndexed: no _ivfpq_meta at $path")
    val in = fs.open(metaP)
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Array(dim, m, kc) = meta.trim.split("\\s+").map(_.toInt)
    val cb = spark.read.parquet(s"$path/codebook")
    val nCb = cb.count()
    require(nCb == kc,
      s"ivfPqSearchIndexed: codebook at $path has $nCb entries, _ivfpq_meta says $kc")
    val centroids = spark.read.parquet(s"$path/centroids")
    val qDf = query.select(lit(0L).as(idCol), col("qv").as(vecCol))
    val probed = ivfAssign(qDf, idCol, vecCol, centroids, probe)
      .select("clabel").collect().map(_.get(0))
    val codes = spark.read.parquet(s"$path/codes")
      .where(col("clabel").isin(probed: _*))
      .select(col(idCol), posexplode(col("codes")).as(Seq("i", "code")))
    pqServe(codes, pqQueryTable(query, cb, m, dim / m), corpus, query,
      idCol, vecCol, shortlist, k)
  }
}
