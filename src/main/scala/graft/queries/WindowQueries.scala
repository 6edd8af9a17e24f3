package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Window functions (SURVEY.md §2.5) — the T-SQL windowed-function
  * surface of the invoked engine (origin I, anchored at the Synapse
  * query step, /root/reference/README.md:156-192).
  *
  * Determinism (SURVEY §7.4-4): ranking with ties is computed over the
  * tie-producing key alone (rank/dense_rank are tie-stable), while
  * position-dependent functions (row_number, ntile, lead/lag,
  * first/last/nth) always order by a unique key suffix.
  *
  * Scale: every window partitions by a bounded-cardinality key
  * (returnflag / custkey / user_id / orderstatus) → one hash shuffle
  * per window spec, per-partition sort, no global sort, state bounded
  * by partition size. Skewed partitions would be handled by AQE;
  * none of these keys are skewed in the TPC-H-ish generator.
  */
object WindowQueries {

  /** q30: ranking family — rank/dense_rank over the non-unique
    * quantity (tie-stable); row_number/ntile over the unique-suffixed
    * order. Computed by the two-phase DistributedRank, NOT a plain
    * window: l_returnflag has 3 values, so the window form would run
    * the whole fact table on 3 tasks at any cluster size. The
    * distributed form range-partitions on (flag, quantity), so
    * parallelism scales with the order-value cardinality instead
    * (AlgebraProps pins it equal to the window form). */
  private def q30(s: SparkSession, d: String): DataFrame =
    graft.operators.DistributedRank.ranked(
        lineitem(s, d).select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"),
        pkeys = Seq("l_returnflag"), tieCols = Seq("l_quantity"),
        uniqueCols = Seq("l_orderkey", "l_linenumber"), ntileK = 4,
        // l_quantity's domain is ~50 integers at ANY table size and no
        // tie can dominate — declare it, saving the probe job
        adaptiveCut = -1)
      .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"),
        col("l_linenumber"), col("rnk"), col("drnk"), col("rn"), col("nt"))
      // lineitem contains fully-duplicate rows (same orderkey+linenumber),
      // so rn itself must join the output order to fix their interleaving.
      .transform(Det.emitWide(_, "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber", "rn"))

  /** q31: cumulative sum/avg/count per customer in order-date order. */
  private def q31(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      round(sum("o_totalprice").over(w), 2).as("run_total"),
      Det.r4e(avg("o_totalprice").over(w)).as("run_avg"),
      count(lit(1)).over(w).as("run_n"))
      .transform(Det.emitWide(_, "o_custkey", "o_orderkey"))
  }

  /** q32: lead/lag with defaults, per user over the event sequence. */
  private def q32(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id"))
    events(s, d).select(
      col("event_id"), col("user_id"), round(col("value"), 2).as("v"),
      round(lag("value", 1, 0.0).over(w), 2).as("prev"),
      round(lead("value", 1, -1.0).over(w), 2).as("nxt"))
      .transform(Det.emitWide(_, "event_id"))
  }

  /** q33: moving aggregate over a 3-row ROWS frame. */
  private def q33(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    events(s, d).select(
      col("event_id"), col("user_id"),
      Det.r4e(avg("value").over(w)).as("mov_avg"),
      round(sum("value").over(w), 2).as("mov_sum"))
      .transform(Det.emitWide(_, "event_id"))
  }

  /** q34: RANGE frame — value-based band over floor(price). The band
    * count depends only on the VALUE, so DistributedRank.bandCount
    * computes it once per distinct (status, pb) through width-sized
    * coarse buckets and joins it back — shuffles key on (status,
    * bucket)/(status, pb), never on the 3-value status alone. */
  private def q34(s: SparkSession, d: String): DataFrame =
    graft.operators.DistributedRank.bandCount(
        orders(s, d)
          .withColumn("pb", floor(col("o_totalprice")).cast("long"))
          .select("o_orderkey", "o_orderstatus", "pb"),
        pkeys = Seq("o_orderstatus"), valCol = "pb", width = 10000L,
        // floor(price) is effectively continuous — declare it, going
        // straight to the bucketed path without the probe job
        adaptiveCut = 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("pb"), col("n_band"))
      .transform(Det.emitWide(_, "o_orderkey"))

  /** q35: first/last/nth over an explicit full frame — per-group
    * scalars, so computed as a top-k aggregate (WindowGroupLimit trims
    * each map task to its local top-k before the 3-value-key shuffle)
    * broadcast-joined back: the full table never funnels through 3
    * window partitions. */
  private def q35(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val edges = graft.operators.DistributedRank.fullFrameEdges(
      o, pkeys = Seq("o_orderstatus"),
      orderCols = Seq(col("o_totalprice"), col("o_orderkey")),
      targetCol = "o_orderkey", nth = 2)
    o.join(broadcast(edges), "o_orderstatus")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("first_v").as("cheapest"), col("last_v").as("dearest"),
        col("nth_v").as("second"))
      .transform(Det.emitWide(_, "o_orderkey"))
  }

  /** q36: top-k per group — the row_number-filter idiom. Spark 4
    * plans this through WindowGroupLimit with a PARTIAL phase: each
    * input partition keeps only its local top-k before the shuffle,
    * so even a group holding a third of the table ships ≤ k rows per
    * map task — already skew-proof, one shuffle. (Verified in the
    * physical plan; the salted two-phase graft.operators.TopK exists
    * for orderings WindowGroupLimit can't serve and is
    * property-tested equal.) */
  private def q36(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_orderstatus"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_orderstatus", "rn")
  }

  /** q238: PERCENT_RANK / CUME_DIST at the VALUE grain (round 19 —
    * the two T-SQL ranking functions q30's family left out; Synapse
    * users lean on both for score normalization): emitted per
    * distinct (flag, quantity) — the row-grain form is one equi-join
    * back, q30's join-back discipline — with rank = cum − c + 1 from
    * integer prefix sums over the BOUNDED value frame (l_quantity's
    * ~50-value domain, q30's argument: a row-grain window here would
    * run the fact table on 3 tasks forever), percent_rank =
    * (rank−1)/(N−1) and cume_dist = cum/N exact rationals → r6e. */
  private def q238(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n_rows"))
    val wc = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.partitionBy("l_returnflag")
    g.withColumn("cum", sum("n_rows").over(wc))
      .withColumn("n", sum("n_rows").over(wp))
      .select(col("l_returnflag"), col("l_quantity"),
        (col("cum") - col("n_rows") + 1).as("rnk"), col("n_rows"),
        // T-SQL defines PERCENT_RANK = 0 for a single-row partition;
        // unguarded (n−1) would divide 0/0 → NaN here and engine-
        // dependent NULL/NaN in the oracle (round-11 ADVICE)
        when(col("n") > 1, Det.r6e((col("cum") - col("n_rows"))
          .cast("double") / (col("n") - 1).cast("double")))
          .otherwise(lit(0.0)).as("percent_rank"),
        Det.r6e(col("cum").cast("double") / col("n").cast("double"))
          .as("cume_dist"))
      .transform(Det.emit(_, "l_returnflag", "l_quantity"))
  }

  /** q239: PERCENTILE_DISC(¼, ½, ¾) WITHIN GROUP (round 19 — the
    * discrete-percentile T-SQL surface; q29/DistributedRank.quantiles
    * cover the CONTINUOUS interpolating form, this returns an actual
    * population value): by the SQL-standard definition — the first
    * value whose cume_dist ≥ p — decided on the ALL-INTEGER rule
    * 4·cum ≥ 4p·N over the same bounded value frame as q238, no
    * float anywhere in the pick; OperatorSpec pins the result equal
    * to Spark's own `percentile_disc ... WITHIN GROUP` built-in on
    * the same table (the built-in buffers each group's multiset —
    * exactly why the cum-rule form is the one that scales). */
  private def q239(s: SparkSession, d: String): DataFrame = {
    val g = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.partitionBy("l_returnflag")
    g.withColumn("cum", sum("c").over(wc))
      .withColumn("n", sum("c").over(wp))
      .groupBy("l_returnflag")
      .agg(max("n").as("n_rows"),
        min(when(lit(4L) * col("cum") >= col("n"), col("l_quantity")))
          .as("p25"),
        min(when(lit(4L) * col("cum") >= lit(2L) * col("n"),
          col("l_quantity"))).as("p50"),
        min(when(lit(4L) * col("cum") >= lit(3L) * col("n"),
          col("l_quantity"))).as("p75"))
      .transform(Det.emit(_, "l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_win_rank" -> q30, "q31_win_running" -> q31,
    "q32_win_lead_lag" -> q32, "q33_win_frame_rows" -> q33,
    "q34_win_frame_range" -> q34, "q35_win_first_last" -> q35,
    "q36_topk_pergroup" -> q36,
    "q238_win_rank_dist" -> q238, "q239_percentile_disc" -> q239)

  val oracles: Map[String, String] = Map(
    "q30_win_rank" ->
      """SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber,
                CAST(rank() OVER wq AS BIGINT) AS rnk,
                CAST(dense_rank() OVER wq AS BIGINT) AS drnk,
                CAST(row_number() OVER wt AS BIGINT) AS rn,
                CAST(ntile(4) OVER wt AS INT) AS nt
         FROM lineitem
         WINDOW wq AS (PARTITION BY l_returnflag ORDER BY l_quantity),
                wt AS (PARTITION BY l_returnflag
                       ORDER BY l_quantity, l_orderkey, l_linenumber)
         ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber, rn""",
    "q31_win_running" ->
      """SELECT o_custkey, o_orderkey,
                round(sum(o_totalprice) OVER w, 2) AS run_total,
                round(avg(o_totalprice) OVER w + 0.00000123, 4) AS run_avg,
                CAST(count(1) OVER w AS BIGINT) AS run_n
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    "q32_win_lead_lag" ->
      """SELECT event_id, user_id, round(value, 2) AS v,
                round(lag(value, 1, 0.0) OVER w, 2) AS prev,
                round(lead(value, 1, -1.0) OVER w, 2) AS nxt
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
         ORDER BY event_id""",
    "q33_win_frame_rows" ->
      """SELECT event_id, user_id,
                round(avg(value) OVER w + 0.00000123, 4) AS mov_avg,
                round(sum(value) OVER w, 2) AS mov_sum
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q34_win_frame_range" ->
      """SELECT o_orderkey, o_orderstatus, pb,
                CAST(count(1) OVER w AS BIGINT) AS n_band
         FROM (SELECT *, CAST(floor(o_totalprice) AS BIGINT) AS pb FROM orders)
         WINDOW w AS (PARTITION BY o_orderstatus ORDER BY pb
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
         ORDER BY o_orderkey""",
    "q35_win_first_last" ->
      """SELECT o_orderkey, o_orderstatus,
                first_value(o_orderkey) OVER w AS cheapest,
                last_value(o_orderkey) OVER w AS dearest,
                nth_value(o_orderkey, 2) OVER w AS second
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_orderkey""",
    "q36_topk_pergroup" ->
      """SELECT o_orderstatus, CAST(rn AS INT) AS rn, o_orderkey,
                round(o_totalprice, 2) AS price
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders)
         WHERE rn <= 3 ORDER BY o_orderstatus, rn""",
    // q238: same value-grain prefix sums; exact rationals → r6e.
    "q238_win_rank_dist" ->
      s"""WITH g AS (SELECT l_returnflag, l_quantity,
                            CAST(count(1) AS BIGINT) AS n_rows
                     FROM lineitem GROUP BY 1, 2),
          w AS (SELECT l_returnflag, l_quantity, n_rows,
                       CAST(sum(n_rows) OVER (PARTITION BY l_returnflag
                           ORDER BY l_quantity ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                       CAST(sum(n_rows) OVER (PARTITION BY l_returnflag)
                            AS BIGINT) AS n
                FROM g)
          SELECT l_returnflag, l_quantity, cum - n_rows + 1 AS rnk,
                 n_rows,
                 CASE WHEN n > 1 THEN
                   round(CAST(cum - n_rows AS DOUBLE)
                         / CAST(n - 1 AS DOUBLE) + ${Det.E6}, 6)
                 ELSE 0.0 END AS percent_rank,
                 round(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
                       + ${Det.E6}, 6) AS cume_dist
          FROM w ORDER BY l_returnflag, l_quantity""",
    // q239: the SQL-standard first-value-with-cume_dist≥p rule on
    // the all-integer 4·cum ≥ 4p·N compare.
    "q239_percentile_disc" ->
      s"""WITH g AS (SELECT l_returnflag, l_quantity,
                            CAST(count(1) AS BIGINT) AS c
                     FROM lineitem GROUP BY 1, 2),
          w AS (SELECT l_returnflag, l_quantity, c,
                       CAST(sum(c) OVER (PARTITION BY l_returnflag
                           ORDER BY l_quantity ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                       CAST(sum(c) OVER (PARTITION BY l_returnflag)
                            AS BIGINT) AS n
                FROM g)
          SELECT l_returnflag, max(n) AS n_rows,
                 min(CASE WHEN 4 * cum >= n THEN l_quantity END) AS p25,
                 min(CASE WHEN 4 * cum >= 2 * n THEN l_quantity END)
                   AS p50,
                 min(CASE WHEN 4 * cum >= 3 * n THEN l_quantity END)
                   AS p75
          FROM w GROUP BY l_returnflag ORDER BY l_returnflag""")
}
