package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-rule LEARNING — the training loop that produces the
  * ranked merge table q179 APPLIES and whose first statistic q121
  * counts (reference anchor: the tokenizer-pricing pass of an LLM
  * data pipeline; algorithm: Sennrich et al. 2016, the subword-nmt
  * loop, re-expressed on the word-frequency table).
  *
  * Why the word-frequency table and not the corpus: BPE statistics
  * are invariant to WHERE a word occurs — only (word, count) matters
  * — so the loop runs over the vocabulary (corpus-sized only in the
  * worst case, and many orders of magnitude smaller in practice; the
  * same contract as q109/q111's vocabulary joins). At 100 TB the
  * corpus is scanned ONCE for the count aggregate (map-side combined,
  * word-keyed shuffle); every round after that touches vocab-sized
  * data only.
  *
  * Per round: adjacent-pair counts (array-domain fan-out, weighted by
  * word count, map-side combined before the pair-keyed shuffle) →
  * argmax pair (count desc, then lexicographic — the deterministic
  * tie-break every engine replays identically) → one disjoint merge
  * pass over the symbol arrays (`mergeExpr` below). The argmax is a
  * LIMIT 1 TakeOrdered whose single row the driver collects — the
  * same metadata-sized driver decision as dupClusters' fixpoint
  * scalar; the OUTPUT of the operator is the rounds-sized merge table
  * itself, never data.
  *
  * SELF-PAIR CONTRACT (shared with q179, loudly): candidate merges
  * are restricted to p1 ≠ p2, because the disjoint-pass apply form is
  * only exact when two matches can never share a symbol. A self-pair
  * like ("l","l") on "small" would need run-splitting; real
  * tokenizers handle it, this operator EXCLUDES it from the candidate
  * set by construction (the `WHERE p1 <> p2` in both engines), so the
  * learned table is exactly the subword-nmt table restricted to
  * heterogeneous pairs.
  */
object BpeTrain {

  final case class Merge(rank: Int, lhs: String, rhs: String, pairCnt: Long)

  /** One disjoint merge pass of (p1, p2) → p1+p2 over a symbol-array
    * expression, in the RELATIONAL match-drop form (merge the left
    * symbol of each match in place, null out the consumed right
    * symbol, filter): exact because matches of a heterogeneous pair
    * are provably disjoint. The `transform(array(inner), aN -> …)[0]`
    * wrapper let-binds the pass input so index lookups don't
    * re-evaluate the whole nested chain — O(len) per pass. */
  def mergeExpr(inner: String, merges: Seq[(String, String)]): String = {
    require(merges.forall { case (a, b) => a != b },
      "bpe: self-pair merge would need run-splitting (disjoint-pass contract)")
    merges.zipWithIndex.foldLeft(inner) { case (e, ((p1, p2), ix)) =>
      val a = s"a$ix"
      s"""element_at(transform(array($e), $a ->
            filter(transform($a, (x, i) -> CASE
                WHEN x = '$p2' AND i > 0
                     AND element_at($a, i) = '$p1' THEN NULL
                WHEN x = '$p1' AND i + 2 <= size($a)
                     AND element_at($a, i + 2) = '$p2' THEN '$p1$p2'
                ELSE x END),
              y -> y IS NOT NULL)), 1)"""
    }
  }

  /** Learn up to `rounds` merges from a (word, count) frame. The
    * caller owns persisting `words` (it is re-scanned once per round;
    * the q190 wrapper pins it). Stops early if no heterogeneous
    * adjacent pair remains. Symbols containing `'` or `\` would break
    * the generated merge literal — the tokenizer upstream emits
    * whitespace-split text as-is, so the guard rejects them loudly
    * rather than corrupting the expression.
    *
    * PLAN-GROWTH BOUND (round 14 — VERDICT r13 item 5): each merge
    * round stacks one `transform(...)` layer onto `syms`, so without
    * truncation the logical plan depth grows linearly in merge count
    * — fine at fixture rounds (~20), but a real 32k-merge vocabulary
    * would blow expression-tree/codegen limits and analysis time long
    * before data size matters. Every `truncateEvery` rounds the
    * vocab-sized symbol frame takes a `Checkpoints.truncate` (the
    * house fixpoint pattern — dupClusters, PageRank), capping plan
    * depth at `truncateEvery` merge layers; superseded checkpoints
    * are released per the round-13 leak discipline, and the LAST one
    * is released before returning (the operator's output is the
    * merge table, never the symbol frame). Honors the session
    * reliable-dir knob (Checkpoints.ReliableDirKey) like every other
    * fixpoint loop. Cadence 16 measured at ~1k merges: flat
    * per-round time, bounded plan depth (NOTES round 14). */
  def learnMerges(words: DataFrame, wordCol: String, cntCol: String,
      rounds: Int, truncateEvery: Int = 16,
      onRound: (Int, Long) => Unit = (_, _) => ()): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(truncateEvery >= 1,
      s"truncateEvery must be >= 1, got $truncateEvery")
    var v = words.select(col(wordCol).as("w"), col(cntCol).as("cnt"),
      expr(s"split($wordCol, '')").as("syms"))
    var pinned: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val tRound = System.nanoTime()
      // sequence(1, n-1) DESCENDS when n = 1 (Spark's sequence walks
      // toward its stop), so single-symbol words are filtered before
      // the fan-out, never fed to it.
      val best = v.where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
               i -> struct(element_at(syms, i) AS p1,
                           element_at(syms, i + 1) AS p2))""")).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(sum("cnt").as("c"))
        .where(col("p1") =!= col("p2"))
        .orderBy(col("c").desc, col("p1").asc, col("p2").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (p1, p2, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        require(!(p1 + p2).exists(ch => ch == '\'' || ch == '\\'),
          s"bpe: symbol pair ('$p1','$p2') would need escaping in the merge expression")
        out += Merge(r + 1, p1, p2, c)
        v = v.withColumn("syms", expr(mergeExpr("syms", Seq((p1, p2)))))
        r += 1
        if (r % truncateEvery == 0 && r < rounds) {
          val cp = Checkpoints.truncate(v)
          pinned.foreach(Checkpoints.release)
          pinned = Some(cp)
          v = cp
        }
        onRound(r, (System.nanoTime() - tRound) / 1000000L)
      }
    }
    // the symbol frame is internal state — nothing downstream reads
    // it, so the final checkpoint is released here, not leaked
    pinned.foreach(Checkpoints.release)
    out.toSeq
  }
}
