package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** CDC envelope analytics — the reference's actual end-to-end
  * computation (SURVEY.md §2.8). The reference consumes CockroachDB
  * changefeed ndjson envelopes `{after:{...}, key:[...], updated:"hlc"}`
  * with Synapse serverless T-SQL: `JSON_VALUE(line,'$.after."city"')` +
  * `CAST(... AS float)` + `SUM ... GROUP BY`
  * (/root/reference/README.md:135-138,173-192).
  *
  * Spark-first re-expression: `to_json(struct(...))` builds the
  * envelope, `get_json_object` is the schema-less JSON_VALUE twin, and
  * the aggregate is a plain partial+final hash aggregate. At 100 TB
  * the envelope serialize/parse is pure map-side codegen'd work —
  * the only shuffle is the final tiny group-by key. */
object CdcQueries {

  /** q60: the README query, end-to-end. Orders are serialized into CDC
    * envelope JSON lines (revenue as a string decimal, matching CRDB's
    * JSON encoding of DECIMAL — SURVEY §7.4-7), parsed back
    * schema-on-read, and aggregated per market segment (the movr
    * `city` stand-in; README.md:178-179,191). */
  private def q60(s: SparkSession, d: String): DataFrame = {
    // customer broadcasts, so the join (and all the JSON work above
    // it) would run on the orders scan's own partitioning — spread it
    // so the envelope serialize/parse parallelizes (no-op at scale).
    val o = spread(s, orders(s, d)); val c = customer(s, d)
    val lines = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(to_json(struct(
        struct(
          col("o_orderkey").as("id"),
          col("c_mktsegment").as("city"),
          round(col("o_totalprice"), 2).cast("string").as("revenue")).as("after"),
        array(col("c_mktsegment"), col("o_orderkey").cast("string")).as("key"),
        concat(col("o_orderkey").cast("string"), lit("0000000000.0000000000"))
          .as("updated"))).as("line"))
    lines
      .select(
        get_json_object(col("line"), "$.after.city").as("city"),
        get_json_object(col("line"), "$.after.revenue").cast("double").as("rev"))
      .groupBy("city")
      .agg(count(lit(1)).as("n_rides"), round(sum("rev"), 2).as("total_revenue"))
      .orderBy("city")
  }

  /** q61: upsert materialization — latest post-image per key, the
    * standard consumer of an at-least-once, per-key-ordered changefeed
    * (README.md:90,137). One shuffle by key; rank-1 filter keeps state
    * bounded per key at any scale. Ties (same truncated second) break
    * on event_id DESC for determinism (SURVEY §7.4-4). */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).withColumn("tsec", date_trunc("second", col("ts")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsec").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("val"), col("tsec"))
      .transform(Det.emitWide(_, "user_id"))
  }

  /** q62: duplicate elimination across at-least-once redelivery
    * (README.md:90) — hash-distinct on the carried columns. */
  private def q62(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select("user_id", "event_type")
      .distinct()
      .orderBy("user_id", "event_type")

  /** q63: delete-aware upsert — the tombstone-applying form of q61.
    * CRDB changefeeds emit deletes as `after: null` envelopes
    * (README.md:135-138; the movr workload runs DELETEs,
    * README.md:140). Here `event_type = 'error'` rows stand in for
    * delete envelopes: each event becomes a wrapped envelope whose
    * post-image is null for deletes, and the replayed state is
    * latest-record-per-key with a winning tombstone REMOVING the key
    * (CdcStreams.latestByKey with isDelete). Same scale shape as q61:
    * one shuffle by key, rank-1 filter, then a map-side tombstone
    * filter. */
  private def q63(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).withColumn("tsec", date_trunc("second", col("ts")))
    // null-safe delete test: only event_type = 'error' is a tombstone;
    // a NULL event_type must keep its post-image (a bare =!= is NULL
    // for NULL input, which when() treats as false — silently turning
    // null-typed events into deletes while the oracle keeps them).
    val env = e.select(
      when(!(col("event_type") <=> "error"),
        struct(col("event_id"), col("event_type"),
          round(col("value"), 2).as("val"), col("tsec"))).as("after"),
      col("user_id"), col("tsec"), col("event_id"))
    graft.streaming.CdcStreams
      .latestByKey(env, Seq("user_id"), Seq("tsec", "event_id"),
        isDelete = Some(col("after").isNull))
      .select(col("user_id"), col("after.event_id").as("event_id"),
        col("after.event_type").as("event_type"), col("after.val").as("val"),
        col("after.tsec").as("tsec"))
      .transform(Det.emitWide(_, "user_id"))
  }

  /** q117: SCD2 history build — the full-history twin of q61's
    * latest-snapshot: every change event becomes a dimension VERSION
    * row with [valid_from, valid_to) validity and an is_current flag
    * (valid_to = next version's valid_from; open-ended for the head).
    * This is what a warehouse keeps when the CDC consumer must answer
    * "what did the row look like at time T". One window over the
    * per-key change sequence: partitioned by the high-cardinality
    * user_id, so parallelism grows with the key space at any scale;
    * emits epoch seconds (SURVEY §2.0-③). */
  private def q117(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tsec"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("val"),
        date_trunc("second", col("ts")).as("tsec"))
      .withColumn("version", row_number().over(w))
      .withColumn("vt", lead(col("tsec"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_id"),
        col("event_type"), col("val"),
        unix_timestamp(col("tsec")).as("valid_from_s"),
        unix_timestamp(col("vt")).as("valid_to_s"),
        col("vt").isNull.cast("int").as("is_current"))
      .transform(Det.emitWide(_, "user_id", "version"))
  }

  /** q136: point-in-time (as-of) snapshot — the CDC consumer's
    * time-travel read: each key's state as of 2024-01-15T00:00:00Z,
    * i.e. the q117 version whose [valid_from, valid_to) interval
    * contains the instant (an event landing EXACTLY on the as-of
    * boundary is visible — closed lower bound). Deliberately NOT
    * implemented by building the full history: the scale-honest plan
    * filters the change stream to tsec <= asof and takes latest-by-key
    * — one pushed-down scan filter + one key-keyed max(struct)
    * aggregate, no window, no join. The q117 interval semantics and
    * this aggregate agree by construction; the ORACLE asserts that by
    * computing the same snapshot THROUGH the interval form. */
  private def q136(s: SparkSession, d: String): DataFrame = {
    val asof = lit("2024-01-15 00:00:00").cast("timestamp")
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("val"),
        date_trunc("second", col("ts")).as("tsec"))
      .where(col("tsec") <= asof)
      .groupBy("user_id")
      .agg(max(struct(col("tsec"), col("event_id"), col("event_type"),
        col("val"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"), col("m.val").as("val"),
        unix_timestamp(col("m.tsec")).as("valid_from_s"))
      .transform(Det.emitWide(_, "user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_cdc_envelope_roundtrip" -> q60,
    "q61_cdc_latest_by_key" -> q61,
    "q62_cdc_dedup" -> q62,
    "q63_cdc_delete_apply" -> q63,
    "q117_scd2_history" -> q117,
    "q136_scd2_asof" -> q136)

  val oracles: Map[String, String] = Map(
    // Oracle aggregates the base tables directly — the JSON round-trip
    // is semantically the identity on (city, round(revenue,2)).
    "q60_cdc_envelope_roundtrip" ->
      """SELECT c_mktsegment AS city, CAST(count(1) AS BIGINT) AS n_rides,
                round(sum(round(o_totalprice, 2)), 2) AS total_revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q61_cdc_latest_by_key" ->
      """SELECT user_id, event_id, event_type, round(value, 2) AS val,
                date_trunc('second', ts) AS tsec
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY user_id
                 ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "q62_cdc_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    // Anti-join form: keys whose latest record is a delete drop out.
    "q63_cdc_delete_apply" ->
      """WITH latest AS (
           SELECT * FROM (SELECT *, row_number() OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('second', ts) DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1)
         SELECT l.user_id, l.event_id, l.event_type,
                round(l.value, 2) AS val, date_trunc('second', l.ts) AS tsec
         FROM latest l
         ANTI JOIN (SELECT user_id FROM latest WHERE event_type = 'error') d
           USING (user_id)
         ORDER BY l.user_id""",
    "q117_scd2_history" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           round(value, 2) AS val,
                           date_trunc('second', ts) AS tsec FROM events),
         v AS (SELECT *,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY tsec, event_id) AS version,
                      lead(tsec) OVER (PARTITION BY user_id
                        ORDER BY tsec, event_id) AS vt
               FROM e)
         SELECT user_id, CAST(version AS INT) AS version, event_id,
                event_type, val,
                epoch_ms(tsec) // 1000 AS valid_from_s,
                epoch_ms(vt) // 1000 AS valid_to_s,
                CAST(vt IS NULL AS INT) AS is_current
         FROM v ORDER BY user_id, version""",
    // Independent algorithm on purpose: the oracle answers the as-of
    // read through the SCD2 interval form (valid_from <= t < valid_to),
    // cross-checking the engine's filter+latest-by-key plan.
    "q136_scd2_asof" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           round(value, 2) AS val,
                           date_trunc('second', ts) AS tsec FROM events),
         v AS (SELECT *,
                      lead(tsec) OVER (PARTITION BY user_id
                        ORDER BY tsec, event_id) AS vt
               FROM e)
         SELECT user_id, event_id, event_type, val,
                epoch_ms(tsec) // 1000 AS valid_from_s
         FROM v
         WHERE tsec <= TIMESTAMP '2024-01-15 00:00:00'
           AND (vt IS NULL OR vt > TIMESTAMP '2024-01-15 00:00:00')
         ORDER BY user_id""")
}
