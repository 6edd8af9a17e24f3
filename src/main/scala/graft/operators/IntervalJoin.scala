package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join — the SCALE path for the pure
  * non-equi join (no shared equi key), which Spark can only plan as a
  * BroadcastNestedLoopJoin / cartesian: fine when one side broadcasts,
  * fatal when both sides are fact-sized. Same contract discipline as
  * BloomPrune: the rewrite is SEMANTICALLY FREE (the oracle is the
  * plain theta join) and turns the O(|P|·|I|) nested loop into an
  * equi join on a derived bucket key.
  *
  *  - each interval [lo, hi] explodes to its covered width-`w` buckets
  *    (⌈len/w⌉ + 1 rows — bounded by the declared max interval
  *    length, the knob that trades replication for join fan-in);
  *  - each point keys by its ONE bucket ⌊p/w⌋;
  *  - the bucket equi join clusters candidates, and the exact
  *    `lo ≤ p ≤ hi` residual drops false neighbours.
  *
  * No dedup pass is needed: a qualifying (interval, point) pair meets
  * in exactly the point's single bucket. Every shuffle keys on the
  * bucket id — high-cardinality by construction (domain span / w); a
  * hot bucket means intervals pile onto one range of the domain, the
  * signal to shrink `w`.
  */
object IntervalJoin {

  /** Inner join of `points` and `intervals` on
    * `lo ≤ p ≤ hi` over a LONG domain (cast dates to epoch days
    * upstream). Interval lengths must not exceed `maxLen` (checked
    * map-side with a loud error — an unbounded interval would explode
    * the bucket fan-out silently). `bucketWidth` defaults to
    * `maxLen`: each interval then covers at most 2 buckets. An
    * INVERTED interval (hi < lo) raises the same loud error: Spark's
    * `sequence(start, stop)` generates a DESCENDING sequence when
    * start > stop, so letting one through would fan out lo-hi+1
    * bucket rows — one corrupt row with hi far below lo is exactly
    * the silent blowup this guard exists to prevent. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pCol: String, loCol: String, hiCol: String,
      maxLen: Long, bucketWidth: Long = 0L): DataFrame = {
    require(maxLen >= 0, s"maxLen must be >= 0, got $maxLen")
    val w = if (bucketWidth > 0) bucketWidth else math.max(1L, maxLen)
    def b(c: Column): Column = floor(c / w).cast("long")
    val guarded = when(
        col(hiCol) >= col(loCol) && col(hiCol) - col(loCol) <= maxLen,
        col(loCol))
      .otherwise(raise_error(concat(
        lit(s"pointInInterval: inverted or longer-than-maxLen=$maxLen interval: ["),
        col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
        lit("]"))))
    val iv = intervals
      .withColumn("__lo", guarded)
      .withColumn("__b",
        explode(sequence(b(col("__lo")), b(col(hiCol)))))
      .drop("__lo")
    val pt = points.withColumn("__b", b(col(pCol)))
    pt.join(iv, Seq("__b"))
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__b")
  }

  /** Interval-OVERLAP join: rows of `left` and `right` whose
    * [lo, hi] bands intersect (`loL ≤ hiR AND loR ≤ hiL`), same
    * bucket rewrite — and DEDUP-FREE even though an overlapping pair
    * co-occupies several buckets: the pair is kept only in the
    * bucket `max(⌊loL/w⌋, ⌊loR/w⌋)`, which is exactly the FIRST
    * common bucket of any intersecting pair (the intersection of
    * their bucket ranges starts there), so each qualifying pair
    * survives exactly once with no distinct shuffle. Column names
    * must not collide across the two sides (alias upstream). Both
    * sides' intervals must be well-formed (`lo ≤ hi`) and bounded by
    * `maxLen` — violations raise a loud map-side error (an inverted
    * interval would otherwise explode via the descending
    * `sequence`). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      loL: String, hiL: String, loR: String, hiR: String,
      maxLen: Long, bucketWidth: Long = 0L): DataFrame = {
    require(maxLen >= 0, s"maxLen must be >= 0, got $maxLen")
    val w = if (bucketWidth > 0) bucketWidth else math.max(1L, maxLen)
    def b(c: Column): Column = floor(c / w).cast("long")
    def explodeBuckets(df: DataFrame, lo: String, hi: String): DataFrame = {
      val guarded = when(
          col(hi) >= col(lo) && col(hi) - col(lo) <= maxLen, col(lo))
        .otherwise(raise_error(concat(
          lit(s"intervalOverlap: inverted or longer-than-maxLen=$maxLen interval: ["),
          col(lo).cast("string"), lit(", "), col(hi).cast("string"),
          lit("]"))))
      df.withColumn("__lo", guarded)
        .withColumn("__b", explode(sequence(b(col("__lo")), b(col(hi)))))
        .drop("__lo")
    }
    explodeBuckets(left, loL, hiL)
      .join(explodeBuckets(right, loR, hiR), Seq("__b"))
      .where(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("__b") === greatest(b(col(loL)), b(col(loR))))
      .drop("__b")
  }
}
