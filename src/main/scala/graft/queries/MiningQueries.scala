package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{TextDedup, TopK}

/** Corpus-mining keys (charter extensions, SURVEY.md §2.10/§2.13):
  * the sampling / vocabulary / dedup-calibration passes a training-data
  * pipeline runs between cleaning and packing. Grouped here rather
  * than in TextQueries to keep that file at its round-4 shape.
  *
  * Scale discipline shared by every key: hashes are md5 (identical in
  * every engine), sampling is hash-ranked (replayable, no rand()),
  * vocabulary joins are word-keyed SHUFFLES (a 100 TB corpus has a
  * corpus-sized vocabulary — same contract as q109/q111), and only
  * O(1)-row aggregates broadcast.
  */
object MiningQueries {

  private def docs(s: SparkSession, d: String): DataFrame = documents(s, d)

  /** Spark-side whitespace tokens; `TS` below is the DuckDB twin. */
  private val TOKS = "filter(split(text, ' '), w -> w <> '')"
  private val TS = "list_filter(string_split(text, ' '), w -> w <> '')"

  /** q119: deterministic stratified sample — 20 docs per language,
    * ranked by a salted md5 of the doc id (the replayable substitute
    * for rand(): same draw on any engine, any retry, any run). Rank
    * goes through TopK.perGroup (salted two-phase row_number), so one
    * giant stratum never pins a single task; the hash itself is pure
    * map-side work. This is the "hold out a fixed audit slice per
    * language" pass of a curation pipeline. */
  private def q119(s: SparkSession, d: String): DataFrame = {
    val h = docs(s, d).select(col("lang"), col("doc_id"),
      md5(concat(lit("smp:"), col("doc_id").cast("string"))).as("hk"))
    TopK.perGroup(h, Seq("lang"), Seq(col("hk").asc, col("doc_id").asc), k = 20)
      .select(col("lang"), col("rn"), col("doc_id"))
      .transform(Det.emitWide(_, "lang", "rn"))
  }

  /** q120: exact heavy hitters — tokens above 0.1% of all token
    * occurrences, with count and corpus share. Two-level aggregate:
    * the token count map-side-combines before its word-keyed shuffle,
    * the grand total is a 1-row broadcast, and the threshold filter is
    * a scalar compare per vocabulary row. The exact-count twin of a
    * count-min/Misra-Gries pass (which only approximates this set). */
  private def q120(s: SparkSession, d: String): DataFrame = {
    val counts = docs(s, d)
      .select(explode(expr(TOKS)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").cast("double").as("tot"))
    counts.crossJoin(broadcast(tot))
      .where(col("cnt") > col("tot") / 1000)
      .select(col("w"), col("cnt"), Det.r6e(col("cnt") / col("tot")).as("share"))
      .transform(Det.emitWide(_, "w"))
  }

  /** q121: top-20 adjacent token pairs — the pair-counting step of BPE
    * vocabulary induction (each merge round recounts exactly this).
    * Bigrams fan out map-side from one tokenization (tokens
    * materialize once per row — see TextDedup.withShingles), counts
    * map-side-combine into the pair-keyed shuffle, and the global
    * top-20 is TakeOrderedAndProject (per-partition heads, never a
    * full sort). Ties at the boundary break on the pair text, so both
    * engines keep identical rows. */
  private def q121(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("toks", expr(TOKS))
      .where(expr("size(toks) >= 2"))
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(20)

  /** q122: MinHash Jaccard ESTIMATE for every LSH candidate pair —
    * fraction of agreeing signature slots. This is the calibration
    * table for the dedup threshold: compare against q89's exact
    * Jaccard to pick the band/row config before running at full
    * scale, and at 100 TB it is the ONLY per-pair similarity that is
    * affordable corpus-wide (exact Jaccard re-shingles both docs; the
    * estimate joins 8-row signatures). Candidates come from the same
    * (seed, sig)-bucket enumeration as q87 — never corpus². */
  private def q122(s: SparkSession, d: String): DataFrame = {
    // sigs feeds three differently-keyed joins (bucket enumeration +
    // both pair sides) — differently-keyed exchanges can't reuse each
    // other, so pin the 8-rows-per-doc signature table instead of
    // computing the shingle→minhash cascade three times.
    val sigs = TextDedup.minhashSignatures(docs(s, d), "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id")
    val sa = sigs.select(col("doc_id").as("a_id"), col("seed"), col("sig").as("siga"))
    val sb = sigs.select(col("doc_id").as("b_id"), col("seed"), col("sig").as("sigb"))
    pairs.join(sa, "a_id")
      .join(sb, Seq("b_id", "seed"))
      .groupBy("a_id", "b_id")
      .agg(Det.r4e(
        sum(when(col("siga") === col("sigb"), 1.0).otherwise(0.0)) / 8.0)
        .as("est_jaccard"))
      .transform(Det.emitWide(_, "a_id", "b_id"))
  }

  /** q123: duplicate-cluster labels over the MinHash LSH pair graph —
    * TextDedup.dupClusters (min-label propagation to a fixpoint, two
    * bucket-keyed shuffles per round, lineage truncated between
    * rounds) bound to the fixture corpus. The DuckDB oracle is a
    * recursive-CTE reachability closure taking min over reachable
    * labels — an independent algorithm, so this key turns the
    * connected-components operator from property-tested into
    * oracle-checked. */
  private def q123(s: SparkSession, d: String): DataFrame = {
    val sigs = TextDedup.minhashSignatures(docs(s, d), "doc_id", "text")
    val pairs = TextDedup.lshCandidatePairs(sigs, "doc_id")
    TextDedup.dupClusters(pairs)
      .transform(Det.emitWide(_, "id"))
  }

  /** q124: edit-distance-verified near-dup pairs — candidates from
    * SimHash pigeonhole banding (q103's machinery: exact for simhash
    * hamming ≤ 3, bucket-keyed join, never corpus²), then verified
    * with exact Levenshtein ≤ 10 (typo-level duplicates). The O(len²)
    * verify runs ONLY on banded candidates — that bound is the whole
    * reason the candidates are banded. Both engines compute classic
    * Levenshtein, so the distances hash-match. The candidate contract
    * (banded, not all-pairs) is part of the key's definition; the
    * oracle encodes the same banding. */
  private def q124(s: SparkSession, d: String): DataFrame = {
    val cand = TextDedup.simhashNearDupPairs(docs(s, d), "doc_id", "text",
      maxHamming = 3)
    val ta = docs(s, d).select(col("doc_id").as("a_id"), col("text").as("ta"))
    val tb = docs(s, d).select(col("doc_id").as("b_id"), col("text").as("tb"))
    cand.join(ta, "a_id").join(tb, "b_id")
      .select(col("a_id"), col("b_id"),
        levenshtein(col("ta"), col("tb")).as("edit_dist"))
      .where(col("edit_dist") <= 10)
      .transform(Det.emitWide(_, "a_id", "b_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q119_stratified_sample" -> q119,
    "q120_heavy_hitters" -> q120,
    "q121_bpe_pairs" -> q121,
    "q122_minhash_est" -> q122,
    "q123_dup_components" -> q123,
    "q124_edit_neardup" -> q124)

  /** Shared DuckDB CTE chain reproducing minhashSignatures +
    * lshCandidatePairs (same constants as the q86/q87 oracles). */
  private val SIG_CTES =
    s"""t AS (SELECT doc_id, $TS AS ts FROM documents),
        sh AS (SELECT doc_id,
                      unnest(list_transform(range(len(ts) - 2),
                        i -> ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])) AS s
               FROM t WHERE len(ts) >= 3),
        hs AS (SELECT doc_id,
                      CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 1000000007 AS h
               FROM sh),
        x AS (SELECT doc_id, k, ((2*k + 1) * h + 7 + 13*k) % 1000000007 AS v
              FROM hs, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) seeds(k)),
        sig AS (SELECT doc_id, k, min(v) AS sig FROM x GROUP BY doc_id, k),
        pr AS (SELECT DISTINCT s1.doc_id AS a_id, s2.doc_id AS b_id
               FROM sig s1 JOIN sig s2
                 ON s1.k = s2.k AND s1.sig = s2.sig AND s1.doc_id < s2.doc_id)"""

  val oracles: Map[String, String] = Map(
    "q119_stratified_sample" ->
      """WITH h AS (SELECT lang, doc_id,
                           md5('smp:' || CAST(doc_id AS VARCHAR)) AS hk
                    FROM documents),
         r AS (SELECT lang, doc_id,
                      row_number() OVER (PARTITION BY lang
                        ORDER BY hk ASC, doc_id ASC) AS rn
               FROM h)
         SELECT lang, CAST(rn AS INT) AS rn, doc_id
         FROM r WHERE rn <= 20 ORDER BY lang, rn""",
    "q120_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest($TS) AS w FROM documents),
          c AS (SELECT w, CAST(count(1) AS BIGINT) AS cnt FROM tk GROUP BY w),
          t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM c)
          SELECT w, cnt, round(cnt / tot + 0.0000000123, 6) AS share
          FROM c, t WHERE cnt > tot / 1000 ORDER BY w""",
    "q121_bpe_pairs" ->
      s"""WITH t AS (SELECT $TS AS ts FROM documents),
          bg AS (SELECT unnest(list_transform(range(len(ts) - 1),
                          i -> ts[i+1] || ' ' || ts[i+2])) AS pair
                 FROM t WHERE len(ts) >= 2)
          SELECT pair, CAST(count(1) AS BIGINT) AS cnt
          FROM bg GROUP BY pair
          ORDER BY cnt DESC, pair ASC LIMIT 20""",
    "q122_minhash_est" ->
      s"""WITH $SIG_CTES
          SELECT p.a_id, p.b_id,
                 round(sum(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END)
                         / 8.0 + 0.00000123, 4) AS est_jaccard
          FROM pr p
          JOIN sig sa ON sa.doc_id = p.a_id
          JOIN sig sb ON sb.doc_id = p.b_id AND sb.k = sa.k
          GROUP BY p.a_id, p.b_id ORDER BY p.a_id, p.b_id""",
    "q124_edit_neardup" ->
      s"""WITH tk AS (SELECT doc_id, unnest($TS) AS w FROM documents),
          h AS (SELECT doc_id,
                       CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hv
                FROM tk),
          bits AS (SELECT doc_id, b,
                          CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END AS vote
                   FROM h, (SELECT unnest(range(60)) AS b)),
          sv AS (SELECT doc_id, b, sum(vote) AS sv FROM bits GROUP BY doc_id, b),
          sh AS (SELECT doc_id,
                 CAST(sum(CASE WHEN sv > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                               ELSE 0 END) AS BIGINT) AS simhash
                 FROM sv GROUP BY doc_id)
          SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          JOIN documents da ON da.doc_id = a.doc_id
          JOIN documents db ON db.doc_id = b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            AND levenshtein(da.text, db.text) <= 10
          ORDER BY a_id, b_id""",
    "q123_dup_components" ->
      s"""WITH RECURSIVE $SIG_CTES,
          e AS (SELECT a_id AS src, b_id AS dst FROM pr
                UNION ALL SELECT b_id, a_id FROM pr),
          reach(id, lbl) AS (
            SELECT src, src FROM (SELECT DISTINCT src FROM e)
            UNION
            SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.id)
          SELECT id, min(lbl) AS cluster
          FROM reach GROUP BY id ORDER BY id""")
}
