package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-time windowing, batch twins (SURVEY.md §2.9). The reference's
  * pipeline is a continuous changefeed consumed as snapshots
  * (/root/reference/README.md:133-138,182); these three queries give
  * the windowed-aggregation semantics their deterministic batch form —
  * the streaming twins (same operators under `readStream`, with
  * watermarks) are exercised in StreamingSpec (s01–s08).
  *
  * All three group on `events.ts` truncated to ≥second granularity
  * (SURVEY §2.0-③: the parquet ns timestamps must never surface raw).
  * Scale: tumbling/sliding windows are pure hash aggregations on the
  * window-start key (sliding fans out ×2 map-side, then combines);
  * session windows shuffle once on user_id with per-user sorted merge
  * — exactly the plan Structured Streaming uses incrementally.
  */
object EventTimeQueries {

  /** q70: 1-hour tumbling window count+sum per event type. */
  private def q70(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("hstart"), col("event_type"),
        col("n"), col("sv"))
      .orderBy("hstart", "event_type")

  /** q71: 1-hour window sliding every 30 minutes — each event lands in
    * exactly 2 windows; the oracle reconstructs the two epoch-aligned
    * 30-min grids with integer arithmetic. */
  private def q71(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("wstart"), col("n"), col("sv"))
      .orderBy("wstart")

  /** q72: session windows, 30-min inactivity gap, per user. Spark
    * merges an event into the open session while next_ts <= prev_ts +
    * gap — an event landing EXACTLY on the session end extends it
    * (window merge condition is start <= end) — so the
    * gaps-and-islands oracle must break only on `gap > 30min`
    * (boundary-equal merges; caught by the sf0.1 oracle run, one
    * exact-boundary pair exists there). */
  private def q72(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("t", date_trunc("second", col("ts")))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n"), col("sv"))
      .transform(Det.emitWide(_, "user_id", "session_start"))

  /** q105: batch sessionization — per-EVENT session ids. q72 yields
    * per-session AGGREGATES; training/attribution pipelines also need
    * the session id ON each event to key downstream joins (the batch
    * twin of incremental sessionization over the CDC stream).
    * Gaps-and-islands: a gap > 30 min starts a new session; the id is
    * the running count of breaks. Scale: both windows partition on
    * user_id (high-cardinality) with identical ordering — one shuffle,
    * one sort, both window functions reuse it. */
  private def q105(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsec"), col("event_id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("tsec", date_trunc("second", col("ts")))
      // first event of a user: lag is NULL -> condition NULL -> 0 (no
      // break), matching the oracle's CASE
      .withColumn("brk",
        when(col("tsec").cast("long")
          - lag(col("tsec").cast("long"), 1).over(w) > 1800L, 1)
          .otherwise(0))
      .withColumn("sess", (sum("brk").over(wCum) + 1).cast("int"))
      .select(col("event_id"), col("user_id"), col("tsec"), col("sess"))
      .transform(Det.emitWide(_, "event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_window_tumbling" -> q70,
    "q71_window_sliding" -> q71,
    "q72_window_session" -> q72,
    "q105_sessionize" -> q105)

  val oracles: Map[String, String] = Map(
    "q70_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hstart, event_type,
                CAST(count(1) AS BIGINT) AS n, round(sum(value), 2) AS sv
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // Two 30-min-offset hour grids; make_timestamp(micros) keeps the
    // window starts naive-UTC like Spark's window().start.
    "q71_window_sliding" ->
      """WITH x AS (SELECT epoch_ms(ts) // 1000 AS sec, value FROM events),
         w AS (SELECT make_timestamp(((sec // 1800) - k) * 1800 * 1000000) AS wstart,
                      value
               FROM x, (VALUES (0), (1)) t(k))
         SELECT wstart, CAST(count(1) AS BIGINT) AS n, round(sum(value), 2) AS sv
         FROM w GROUP BY wstart ORDER BY wstart""",
    // Gaps-and-islands cross-check of session semantics (<=-gap merges).
    "q72_window_session" ->
      """WITH e AS (SELECT user_id, date_trunc('second', ts) AS t, value
                    FROM events),
         g AS (SELECT user_id, t, value,
                      CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                                <= INTERVAL 30 MINUTE
                           THEN 0 ELSE 1 END AS brk
               FROM e),
         s AS (SELECT user_id, t, value,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY t
                                     ROWS UNBOUNDED PRECEDING) AS sid
               FROM g)
         SELECT user_id, min(t) AS session_start,
                CAST(count(1) AS BIGINT) AS n, round(sum(value), 2) AS sv
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q105_sessionize" ->
      """WITH e AS (SELECT event_id, user_id,
                           date_trunc('second', ts) AS tsec FROM events),
         g AS (SELECT *,
                      CASE WHEN date_diff('second',
                             lag(tsec) OVER (PARTITION BY user_id
                               ORDER BY tsec, event_id), tsec) > 1800
                           THEN 1 ELSE 0 END AS brk
               FROM e)
         SELECT event_id, user_id, tsec,
                CAST(1 + sum(brk) OVER (PARTITION BY user_id
                  ORDER BY tsec, event_id
                  ROWS UNBOUNDED PRECEDING) AS INT) AS sess
         FROM g ORDER BY event_id""")
}
