package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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

  /** Fixture-lake path for q149/q145: unique per APPLICATION (two
    * concurrent runs must not clobber each other's lake) and
    * reclaimed at JVM exit (the per-app name means no later run
    * reuses it, so without the hook every bench invocation would
    * leak a directory in java.io.tmpdir forever). */
  private val fixtureLakes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val fixtureCleanup: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      fixtureLakes.forEach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(p))
      }))
  private def fixtureLake(s: SparkSession, tag: String, d: String): String = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_lake_${tag}_" +
      s.sparkContext.applicationId + "_" + d.replaceAll("[^A-Za-z0-9]", "_")
    fixtureLakes.add(path)
    fixtureCleanup
    path
  }

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
  private def q105(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.assign(
        events(s, d).withColumn("tsec", date_trunc("second", col("ts"))),
        "user_id", "tsec", gapSec = 1800L, orderCols = Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("tsec"), col("sess"))
      .transform(Det.emitWide(_, "event_id"))

  /** q116: strict-order funnel (view → click → purchase) per user:
    * first view, first click strictly AFTER that view, first purchase
    * strictly after that click — the conversion attribution a product/
    * training-telemetry pipeline computes. Three stages, each one
    * user_id-keyed filter+min aggregate joined to the previous stage's
    * anchor; all three shuffles key on user_id, so the exchanges
    * co-locate and the joins never reshuffle. Emits epoch seconds
    * (never raw ns timestamps — SURVEY §2.0-③). */
  private def q116(s: SparkSession, d: String): DataFrame =
    graft.operators.Funnel.strictOrder(
        events(s, d).select(col("user_id"), col("event_type"),
          date_trunc("second", col("ts")).as("t")),
        "user_id", "event_type", "t",
        stages = Seq("view", "click", "purchase"))
      .select(col("user_id"),
        unix_timestamp(col("t_view")).as("view_s"),
        unix_timestamp(col("t_click")).as("click_s"),
        unix_timestamp(col("t_purchase")).as("purchase_s"),
        col("converted"))
      .transform(Det.emitWide(_, "user_id"))

  /** q125: daily cohort retention — users grouped by first-seen day,
    * counted per day-offset of later activity (the classic retention
    * triangle). Scale shape: the (user, day) dedup and the first-seen
    * aggregate BOTH shuffle on user_id (exchange co-located with the
    * join that follows), then the triangle aggregate runs on the
    * bounded (cohort_day, offset) key. Each (user, day) pair maps to
    * exactly one (cohort, offset) cell, so count(1) over the deduped
    * pairs IS the distinct-user count — no countDistinct expansion
    * needed. */
  private def q125(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val active = ev.distinct()
    active.join(first, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      // dates emit as ISO strings: DATE columns round-trip differently
      // through the two engines' parquet writers (SURVEY §2.0-③)
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_users"))
      .transform(Det.emitWide(_, "cohort_day", "day_offset"))
  }

  /** q126: key-distribution skew profile over events.user_id — the
    * diagnostic a 100 TB operator runs BEFORE choosing a join/agg
    * strategy (salting, AQE skew thresholds, broadcast cutoffs): per
    * key counts, the top-20 heaviest keys with their corpus share,
    * and the max/median hot-key ratio every row carries. One
    * key-keyed aggregate + a 1-row stats broadcast +
    * TakeOrderedAndProject — the profile never sorts the full key
    * set. Median is the exact interpolated percentile (the q29
    * idiom), rounded on both engines. */
  private def q126(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      Det.r4e(expr("percentile(cnt, 0.5D)")).as("p50_cnt"),
      max("cnt").as("max_cnt"),
      sum("cnt").cast("double").as("tot"))
    counts.crossJoin(broadcast(stats))
      .orderBy(col("cnt").desc, col("user_id").asc)
      .limit(20)
      .select(col("user_id"), col("cnt"),
        Det.r6e(col("cnt") / col("tot")).as("share"),
        col("p50_cnt"), col("max_cnt"),
        Det.r4e(col("max_cnt") / col("p50_cnt")).as("skew"))
  }

  /** q129: time-series gap-fill + forward-fill — the hourly activity
    * series per event type on a COMPLETE hour spine (min..max observed
    * hour per type), missing hours filled with n=0 and the last
    * observed hourly revenue carried forward (the resample/ffill pass
    * a monitoring or feature-engineering pipeline runs before
    * diffing/windowing a series). Scale shape: the spine explodes
    * from a 5-row min/max aggregate — calendar-sized (|types| ×
    * |hours|), NOT data-sized — so the left join keys (type, hour)
    * against the hourly aggregate, and the forward-fill window runs
    * over spine rows only. A per-type window partition is fine here
    * precisely because its input is the calendar, not the events. */
  private def q129(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("rev"))
    val spine = hourly.groupBy("event_type")
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .withColumn("n_filled", coalesce(col("n"), lit(0L)))
      .withColumn("rev_ff", last(col("rev"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("n").isNull.cast("int"))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hr"),
        col("n_filled"), col("rev_ff"), col("is_gap"))
      .transform(Det.emitWide(_, "event_type", "hr"))
  }

  /** q132: user-journey transition matrix — first-order Markov counts
    * and probabilities between consecutive event types per user
    * (ordered by event time), the "what happens after a click" table
    * behind funnel design and session modeling. Scale shape: ONE
    * user_id-keyed shuffle+sort feeds the lead() window (high-
    * cardinality partition key — never pins a task), transition counts
    * aggregate on the bounded (src, dst) key, and the per-source
    * totals are a |types|-row broadcast joined back map-side. */
  private def q132(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tsec"), col("event_id"))
    val tr = events(s, d)
      .withColumn("tsec", date_trunc("second", col("ts")))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .where(col("dst").isNotNull)
      .select(col("event_type").as("src"), col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    val tot = tr.groupBy("src").agg(sum("cnt").cast("double").as("tot"))
    tr.join(broadcast(tot), "src")
      .select(col("src"), col("dst"), col("cnt"),
        Det.r4e(col("cnt") / col("tot")).as("p"))
      .transform(Det.emit(_, "src", "dst"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_window_tumbling" -> q70,
    "q71_window_sliding" -> q71,
    "q72_window_session" -> q72,
    "q105_sessionize" -> q105,
    "q116_funnel" -> q116,
    "q125_cohort_retention" -> q125,
    "q126_skew_profile" -> q126,
    "q129_gapfill_ffill" -> q129,
    "q132_markov_transitions" -> q132,
    "q137_cumulative_users" -> q137,
    "q139_week_retention" -> q139,
    "q140_user_features" -> q140,
    "q141_rolling_wau" -> q141,
    "q144_session_cooccurrence" -> q144,
    "q205_interarrival" -> q205,
    "q206_mad_outliers" -> q206,
    "q212_attribution" -> q212,
    "q213_seasonal_anomaly" -> q213,
    "q215_seq_pattern" -> q215,
    "q216_funnel_latency" -> q216,
    "q226_cusum_changepoint" -> q226,
    "q234_km_survival" -> q234,
    "q253_nelson_aalen" -> q253,
    "q256_odds_ratio" -> q256,
    "q257_perm_entropy" -> q257,
    "q258_kendall_tau" -> q258,
    "q260_cvm_drift" -> q260,
    "q262_theil_sen" -> q262,
    "q263_runs_test" -> q263,
    "q264_page_hinkley" -> q264,
    "q266_dow_eta2" -> q266,
    "q267_state_dwell" -> q267,
    "q268_hour_shape_jsd" -> q268,
    "q269_retention_half_life" -> q269,
    "q270_user_turnover" -> q270,
    "q235_cuped" -> q235,
    "q236_mann_kendall" -> q236,
    "q237_logrank" -> q237,
    "q145_partition_prune" -> q145,
    "q149_hll_union" -> q149,
    "q150_mg_heavy_hitters" -> q150)

  /** q150: Misra–Gries heavy hitters (functions.MisraGries) — top-50
    * users by event count through the CONSTANT-STATE sketch aggregate.
    * Two regimes, both covered: with k = 2048 counters every fixture
    * SF (≤ 1500 users) stays in the EXACT regime — the summary equals
    * the true counts, so this key is fully oracle-checked — while the
    * sketchy regime (distinct keys ≫ k, undercount ≤ n/(k+1), every
    * key above that band retained) is pinned by the AlgebraProps
    * brute-force property on multi-partition skewed streams. The
    * top-50 boundary tie-breaks (count desc, key asc) in the
    * aggregator's own finish order, matching the oracle's ORDER BY.
    * Scale: one partial+final aggregate whose buffer is ≤ k entries
    * per task regardless of input rows — the exact `groupBy.count`
    * twin's state is the whole key dictionary. */
  private def q150(s: SparkSession, d: String): DataFrame = {
    graft.functions.MisraGries.register(s, k = 2048)
    events(s, d).select(col("user_id"))
      .agg(expr("mg_topk_2048(user_id)").as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "kc")))
      .where(col("pos") < 50)
      .select(col("kc._1").as("user_id"), col("kc._2").as("n"))
      .transform(df => Det.emit(df, col("n").desc, col("user_id").asc))
  }

  /** q149: MERGEABLE distinct-count sketches — the pattern that makes
    * COUNT(DISTINCT) incremental at lake scale: sketch each day ONCE
    * (`hll_sketch_agg`, constant state per group), persist the binary
    * sketch column to parquet, and answer any later rollup by UNIONING
    * stored sketches (`hll_union_agg`) instead of rescanning raw
    * events — here daily user sketches folded into weekly
    * distinct-user estimates. A re-aggregation over raw data reads
    * the week's events again; the sketch union reads 7 rows of ~KB
    * binaries per week regardless of event volume. Approximate by
    * nature → no SQL oracle (q28 contract); OperatorSpec bounds the
    * unioned estimates within 5% of exact weekly distincts AND pins
    * the round-trip (write → read → union) against the in-memory
    * union. Datasketches HLL is deterministic for a given input set,
    * so the key is replay-stable. */
  private def q149(s: SparkSession, d: String): DataFrame = {
    val lake = fixtureLake(s, "hll", d)
    val p = new org.apache.hadoop.fs.Path(lake)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy("day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .write.parquet(lake)
    s.read.parquet(lake)
      .groupBy(date_trunc("week", col("day")).cast("date").as("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"))
      .transform(Det.emit(_, "week"))
  }

  /** q145: day-partition pruning round-trip — the reference's single
    * most explicit optimization, consuming ONE day's directory instead
    * of scanning the whole lake (the day-glob of
    * /root/reference/README.md:182), planner-driven instead of
    * string-built. Writes the events table day-partitioned
    * (`Lake.writePartitioned` — Hive-style `ingest_date=` layout),
    * reads one day back through `Lake.readDay`, and aggregates it; the
    * oracle computes the same day from the RAW table, proving the
    * pruned scan loses nothing. PlanSpec pins the plan property that
    * matters at scale: the scan's PartitionFilters select exactly one
    * of the 30 day-directories — at a real lake, one directory
    * regardless of lake size, where the unpruned scan reads all of it.
    * The rewrite is idempotent (the lake dir is rebuilt per run;
    * writePartitioned itself appends). */
  private def q145(s: SparkSession, d: String): DataFrame = {
    val lake = fixtureLake(s, "prune", d)
    val p = new org.apache.hadoop.fs.Path(lake)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    graft.sources.Lake.writePartitioned(
      events(s, d).select(col("event_id"), col("event_type"),
        col("value"), col("ts")),
      "ts", lake)
    graft.sources.Lake.readDay(s, lake, "2024-01-05")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sv"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q144: session co-occurrence lift — for every unordered pair of
    * event types, the number of sessions containing BOTH and the lift
    * P(a,b) / (P(a)·P(b)) over sessions (market-basket association,
    * sessionized: lift > 1 = the pair travels together). Composes
    * `Sessionize.assign` with the mining rollup. Scale shape: the
    * session window's user-keyed shuffle is the only data-sized
    * exchange; the per-session type set is bounded by |types| (≤ 5
    * here), so the within-session pair fan-out is a bounded map-side
    * self-join on the (user, sess) key; counts land on the bounded
    * (type, type) key and the session total is a 1-row broadcast. */
  /** q205: INTER-ARRIVAL profile per event type (round 15 — the
    * cadence statistic behind session-gap tuning (q72/q105's 30-min
    * threshold is exactly a cut on THIS distribution), rate-limit
    * sizing, and bot detection): consecutive same-user gaps in
    * seconds, rolled up per the FOLLOWING event's type with count /
    * mean / max / exact median. Scale: one per-user lag window
    * (user_id is the suite's standard high-cardinality partition key
    * — the q105 contract; ordering tie-breaks on event_id so equal
    * timestamps rank identically in both engines), then a
    * type-keyed rollup and DistributedRank.quantiles for the exact
    * p50 (the q29 machinery — no whole-multiset buffer). Gaps are
    * exact integer seconds; mean under r4e; median interpolation
    * bit-identical to percentile() on both engines (q29's contract). */
  private def q205(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val gaps = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev")))
          .as("gap_s"))
      .transform(Det.pin)
    val stats = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        Det.r4e(avg("gap_s")).as("avg_gap_s"),
        max("gap_s").as("max_gap_s"))
    val med = graft.operators.DistributedRank.quantiles(
        gaps.select(col("event_type"), col("gap_s").cast("double")),
        Seq("event_type"), "gap_s", Seq("p50" -> 0.5), adaptiveCut = 0)
      .select(col("event_type"), Det.r4e(col("p50")).as("p50_gap_s"))
    stats.join(med, "event_type")
      .transform(Det.emit(_, "event_type"))
  }

  /** q206: MAD-based robust outlier screen per event type (round 16 —
    * the robust complement to q160's winsorization: median absolute
    * deviation is the 50%-breakdown scale estimator, so a burst of
    * corrupt values cannot inflate its own detection threshold the
    * way it inflates a stddev z-score): per type, the exact median of
    * `value`, the exact MAD, and how many events fall outside
    * med ± 4.4478·MAD (3σ under the normal-consistency constant
    * 1.4826, folded into ONE literal so both engines multiply
    * identically). Scale: two DistributedRank.quantiles passes (the
    * q29 machinery — heavy state is the per-(type, value) count
    * frame, never a type's row multiset), each #types-row result
    * broadcast back for a map-side deviation/compare; the only
    * corpus-keyed shuffles are (type, value)-grained. Floats: med and
    * MAD are bit-identical to percentile_cont on both engines (the
    * quantiles contract); |v−med| and 4.4478·mad are the same IEEE op
    * sequence in the oracle, so the strict `>` can only disagree on
    * an exact tie — which both engines then resolve the same way. */
  private def q206(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d).select(col("event_type"), col("value"))
      .transform(Det.pin)
    val med = graft.operators.DistributedRank.quantiles(
        base, Seq("event_type"), "value", Seq("med" -> 0.5),
        adaptiveCut = 0)
    val dev = base.join(broadcast(med), "event_type")
      .select(col("event_type"), col("med"),
        abs(col("value") - col("med")).as("dev"))
      .transform(Det.pin)
    val mad = graft.operators.DistributedRank.quantiles(
        dev, Seq("event_type"), "dev", Seq("mad" -> 0.5),
        adaptiveCut = 0)
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        Det.r4e(max("med")).as("med"),
        Det.r4e(max("mad")).as("mad"),
        sum(when(col("dev") > lit(4.4478) * col("mad"), 1L)
          .otherwise(0L)).as("n_out"))
      .withColumn("out_rate",
        Det.r4e(col("n_out") / col("n").cast("double")))
      .transform(Det.emit(_, "event_type"))
  }

  /** q212: SESSION ATTRIBUTION (round 17 — the marketing-analytics
    * question every event pipeline answers after q72's sessionize and
    * q116's funnel: WHICH entry point gets credit for a conversion?):
    * each purchase is attributed to its 30-min session's FIRST event
    * type (first-touch) and to the event immediately BEFORE it in the
    * session (last-touch; a purchase that opens its session credits
    * 'entry'), rolled up to the (first_touch, last_touch) matrix with
    * purchase counts and revenue. Session definition is exactly
    * q144/q105's (Sessionize.assign, 1800 s gap on second-truncated
    * ts, event_id tie-break) so the three keys agree on what a
    * session IS. Scale: one user-keyed shuffle for the session
    * window, the same partition carrying the (user, sess) windows —
    * no second shuffle (partitionBy(user, sess) is a prefix-refining
    * key); the rollup is #types². Floats: revenue is a double sum
    * under r2e — summation-order noise is ~1e-7 absolute against a
    * 1e-4 boundary shift. */
  private def q212(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = graft.operators.Sessionize.assign(
        events(s, d).withColumn("tsec", date_trunc("second", col("ts"))),
        "user_id", "tsec", gapSec = 1800L, orderCols = Seq("event_id"))
    val ws = Window.partitionBy("user_id", "sess")
      .orderBy(col("tsec").asc, col("event_id").asc)
    sess
      .withColumn("first_touch", first(col("event_type")).over(ws))
      .withColumn("prev_type", lag(col("event_type"), 1).over(ws))
      .where(col("event_type") === "purchase")
      .select(col("first_touch"),
        coalesce(col("prev_type"), lit("entry")).as("last_touch"),
        col("value"))
      .groupBy("first_touch", "last_touch")
      .agg(count(lit(1)).as("n_purchases"),
        Det.r2e(sum("value")).as("revenue"))
      .transform(Det.emit(_, "first_touch", "last_touch"))
  }

  /** q213: SEASONAL-BASELINE anomaly screen (round 17 — the
    * seasonality-aware complement to q131's global z-score: traffic
    * has an hour-of-day shape, so "3× the average" at 4 am is an
    * incident while the same count at noon is Tuesday; the baseline
    * must be per (type, hour-of-day) before a residual means
    * anything): per (event_type, hr) the count of (day, hr) cells,
    * the mean cell count, the max, and how many cells run hot —
    * cnt > 2×mean, decided as the EXACT integer compare
    * cnt·n_cells > 2·sum_cnt so no float threshold exists. Absent
    * cells count as zero via a dense day×hour×type spine (the q129
    * calendar discipline — built from a 1-row bounds aggregate by
    * explode, types from a 1-row collect_set broadcast; never a
    * data-sized join). Scale: one (type, day, hr) hash aggregate over
    * the corpus (map-side combinable); everything after is
    * calendar-sized. */
  private def q213(s: SparkSession, d: String): DataFrame = {
    // pinned: bounds, the type set, and the cell counts all fold from
    // this one projection — without the pin the events scan runs 3×
    val ev = events(s, d).select(col("event_type"),
      to_date(col("ts")).as("day"), hour(col("ts")).as("hr"))
      .transform(Det.pin)
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val types = ev.agg(sort_array(collect_set("event_type")).as("tps"))
    val spine = broadcast(bounds)
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .select(col("day"), explode(expr("sequence(0, 23)")).as("hr"))
      .crossJoin(broadcast(types))
      .select(col("day"), col("hr"), explode(col("tps")).as("event_type"))
    // cellCnt is (type, day, hr)-grain — calendar-bounded but
    // type-cardinality-sensitive (10 yr × 1000 types ≈ 88M rows), so
    // it carries NO broadcast hint: a data-derived domain's size grows
    // with a domain cardinality, and the planner/AQE will broadcast it
    // at any scale where that's actually safe (it does at fixture
    // scale). Only the provably tiny frames (1-row bounds, 1-row type
    // set, (type, hr)-grain stats ≤ 24·|types|) keep their hints.
    val cellCnt = ev.groupBy("event_type", "day", "hr")
      .agg(count(lit(1)).as("cnt"))
    val cells = spine
      .join(cellCnt, Seq("event_type", "day", "hr"), "left")
      .na.fill(0L, Seq("cnt"))
      .transform(Det.pin)
    val stats = cells.groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n_cells"), sum("cnt").as("sum_cnt"),
        max("cnt").as("max_cnt"))
    cells.join(broadcast(stats), Seq("event_type", "hr"))
      .groupBy("event_type", "hr")
      .agg(max("n_cells").as("n_cells"),
        Det.r4e(max("sum_cnt") / max("n_cells").cast("double"))
          .as("avg_cnt"),
        max("max_cnt").as("max_cnt"),
        sum(when(col("cnt") * col("n_cells") > lit(2L) * col("sum_cnt"),
          1L).otherwise(0L)).as("n_hot"))
      .transform(Det.emit(_, "event_type", "hr"))
  }

  /** q226: CUSUM CHANGEPOINT screen per event type (round 18 — the
    * level-shift detector between q213's seasonal baseline and s45's
    * cadence EWMA: q213 asks "which hours are hot vs their own
    * seasonal cell", this asks "WHEN did the type's daily rate shift"
    * — the classic single-changepoint CUSUM statistic, argmax over i
    * of |Σ_{j≤i}(x_j − x̄)|): per type over the DENSE daily spine
    * (q213's discipline — a missing day is a zero, not a gap), the
    * day where the cumulative deviation from the global mean peaks,
    * that peak's exact value, and the before/after mean rates. The
    * decision is EXACT INTEGER arithmetic: S_i ∝ n·prefix_i − i·total
    * (the x̄ division cross-multiplied away), argmax on |dev| with
    * the EARLIEST day breaking ties; i = n is excluded (S_n ≡ 0 —
    * not a changepoint). Overflow bound (q217's discipline, since
    * `dev` is EMITTED): |dev| ≤ n·total — exact in BIGINT while
    * #days × per-type rows ≤ 9.2e18 (10 years × 2.5e14 rows/type);
    * past that, decimal(38,0) internally and report-artifact
    * emission. Scale: one map-side-combinable (type, day) aggregate;
    * every window runs over the BOUNDED types×days spine, never over
    * rows (the q220/q221 prefix discipline). */
  private def q226(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .transform(Det.pin)
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val types = ev.agg(sort_array(collect_set("event_type")).as("tps"))
    val spine = broadcast(bounds)
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(broadcast(types))
      .select(col("day"), explode(col("tps")).as("event_type"))
    val dayCnt = ev.groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
    val cells = spine.join(dayCnt, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("cnt")).transform(Det.pin)
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("event_type")
    val dev = cells
      .withColumn("i", row_number().over(
        Window.partitionBy("event_type").orderBy("day")).cast("long"))
      .withColumn("pre", sum("cnt").over(w))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("total", sum("cnt").over(whole))
      .where(col("i") < col("n"))
      .withColumn("dev", col("n") * col("pre") - col("i") * col("total"))
    dev.groupBy("event_type")
      .agg(max(struct(abs(col("dev")).as("a"), (-col("i")).as("ni"),
        col("day").as("dy"), col("dev").as("dv"), col("i").as("ix"),
        col("pre").as("pr"), col("n").as("nn"),
        col("total").as("tt"))).as("m"))
      .select(col("event_type"),
        date_format(col("m.dy"), "yyyy-MM-dd").as("cp_day"),
        col("m.nn").as("n_days"), col("m.tt").as("total"),
        col("m.dv").as("dev"),
        Det.r4e(col("m.pr").cast("double") / col("m.ix")).as("pre_mean"),
        Det.r4e((col("m.tt") - col("m.pr")).cast("double")
          / (col("m.nn") - col("m.ix"))).as("post_mean"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q215: EVENT-SEQUENCE pattern counts (round 17 — the CEP-lite
    * query between q132's adjacent-transition matrix and q116's
    * anywhere-in-history funnel: how often does a LITERAL CONSECUTIVE
    * type chain occur inside a session?): per pattern, total
    * occurrences, sessions containing it, distinct users. Each
    * session's type chain is rendered once as a token-terminated
    * string (`view>click>...>` — every token ends in `>`, and no
    * event type is a suffix of another, so a pattern can only match
    * at token boundaries); occurrences are counted by the
    * replace-shrink identity (len − len(replace(seq, p, ''))) / len(p)
    * — left-to-right non-overlapping greedy in both engines, no regex
    * engine semantics to diverge on. Scale: one user-keyed shuffle
    * for sessionize; the per-session array is bounded by session
    * length (the q104/q179 array discipline) and array_sort makes
    * collect_list order-free; the ×#patterns fanout is a map-side
    * explode of a literal array (no join); the rollup is #patterns. */
  /** q234: KAPLAN–MEIER retention survival curve (round 19 — the
    * survival-analysis statistic the retention family lacked:
    * q125/q139 report cohort retention at FIXED horizons, but "how
    * long does a user stay active?" with RIGHT-CENSORING — users
    * still active when observation ends must not count as churned —
    * is the product-limit estimator's job, the standard lifetime
    * readout): per user, lifetime = last PURCHASE − first PURCHASE in
    * days (round 13 — the activity signal is the revenue event, not
    * any click: at every shipped SF some users' purchases stop well
    * before their clicks do, so the oracle exercises real risk sets —
    * the all-events lifetime was censored for EVERY fixture user and
    * the KM fold only ever ran its empty branch, VERDICT r12 #6);
    * censored iff the last purchase falls within 7 days of the
    * observation edge = the last day ANY event was observed (the
    * horizon is when the telescope stopped looking, not when this
    * user's purchases stopped). At each death time t: d = churns at
    * exactly t,
    * n = users with lifetime ≥ t (suffix count — total minus the
    * prefix, all integers over the BOUNDED lifetime-grain frame,
    * ≤ #calendar-days rows), and S(t) = Π(1 − d/n) computed as
    * exp(Σ ln((n−d)/n)) — each ln argument an exact rational from
    * integers, the cumulative sum over the bounded frame in a fixed
    * ascending order (r6e absorbs the last-bit fold-order freedom);
    * a final death that empties the risk set takes a −1000 sentinel
    * ln-term (exp underflows to exact 0.0 in both engines — Spark's
    * log(0) is null while DuckDB's errors, so the boundary never
    * reaches either). Scale: one scan to the user grain, one
    * lifetime-grain rollup, windows over the bounded frame only. */
  private def q234(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evAll = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"))
    val mx = evAll.agg(max("day").as("dmax"))
    val users = evAll.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min("day").as("f"), max("day").as("l"))
      .crossJoin(broadcast(mx))
      .select(datediff(col("l"), col("f")).cast("long").as("t"),
        (datediff(col("dmax"), col("l")) < 7).as("censored"))
      .transform(Det.pin)
    val g = users.groupBy("t").agg(
      sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("m"))
    val tot = users.agg(count(lit(1)).as("ntot"))
    val wc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val deaths = g.withColumn("cm", sum("m").over(wc))
      .crossJoin(broadcast(tot))
      .withColumn("n_risk", col("ntot") - col("cm") + col("m"))
      .where(col("d") > 0)
    deaths
      .withColumn("lnterm", when(col("n_risk") > col("d"),
          log((col("n_risk") - col("d")).cast("double") /
            col("n_risk").cast("double")))
        .otherwise(lit(-1000.0)))
      .withColumn("surv", exp(sum("lnterm").over(wc)))
      .select(col("t").as("t_days"), col("d").as("n_churn"),
        col("n_risk"), Det.r6e(col("surv")).as("survival"))
      .transform(Det.emit(_, "t_days"))
  }

  /** q253: NELSON–AALEN cumulative hazard over q234's retention
    * lifetimes (round 22 — the additive companion to the KM product
    * curve: H(t) = Σ_{t_i ≤ t} d_i/n_i is the standard estimator when
    * hazard RATES are the readout — "how fast is churn accelerating"
    * reads off H's slope, invisible in S(t)'s products — and its
    * Fleming–Harrington transform exp(−H) is the survival estimate of
    * choice in small risk sets where KM's 1−d/n factors go degenerate;
    * Aalen 1978, Fleming & Harrington 1984). Identical lifetime /
    * censoring / risk-set construction as q234 (purchase lifetimes,
    * 7-day observation-edge censoring, suffix-count risk sets — all
    * exact integers over the bounded lifetime-grain frame); each
    * hazard increment d/n is ONE float division of exact integers,
    * the cumulative sum folds in fixed ascending-t order on both
    * engines (r6e absorbs last-bit fold-order freedom), and exp(−H)
    * is applied to the UNROUNDED sum. Scale: one scan to the user
    * grain, one lifetime-grain rollup, windows over the bounded
    * frame only (the q234 contract verbatim). */
  private def q253(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evAll = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"))
    val mx = evAll.agg(max("day").as("dmax"))
    val users = evAll.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min("day").as("f"), max("day").as("l"))
      .crossJoin(broadcast(mx))
      .select(datediff(col("l"), col("f")).cast("long").as("t"),
        (datediff(col("dmax"), col("l")) < 7).as("censored"))
      .transform(Det.pin)
    val g = users.groupBy("t").agg(
      sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("m"))
    val tot = users.agg(count(lit(1)).as("ntot"))
    val wc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("cm", sum("m").over(wc))
      .crossJoin(broadcast(tot))
      .withColumn("n_risk", col("ntot") - col("cm") + col("m"))
      .where(col("d") > 0)
      .withColumn("h", sum(
        col("d").cast("double") / col("n_risk").cast("double")).over(wc))
      .select(col("t").as("t_days"), col("d").as("n_churn"),
        col("n_risk"), Det.r6e(col("h")).as("cum_hazard"),
        Det.r6e(exp(-col("h"))).as("fh_survival"))
      .transform(Det.emit(_, "t_days"))
  }

  /** q256: ODDS RATIO of heavy purchasing given heavy errors, with
    * its Wald 95% CI (round 22 — the effect-size readout q231's
    * chi-square and q228's rank test both lack: the standard 2×2
    * epidemiology statistic with the log-normal CI that says whether
    * the association survives sampling noise; the business read is
    * "do error-heavy users buy more or less than the rest"): per
    * user, exposed = ABOVE-MEAN error count, outcome = ABOVE-MEAN
    * purchase count — the mean splits are exact integer
    * cross-multiplications (errs·U > Σerrs) in decimal(38,0) (the
    * q240/q245 overflow discipline: count·users overflows a long at
    * ~1e9 × 1e10 scale), chosen over any-event flags because every
    * fixture user both clicks and purchases (a degenerate 2×2) and
    * over medians because interpolated medians diverge across
    * engines. Exact integer cells folded in one pass; OR and the CI
    * a fixed float chain over the exact cells (products in DOUBLE),
    * any zero cell emitting 0.0 across the floats rather than ±∞.
    * Scale: one scan to the user grain (map-side-combinable count
    * flags), a broadcast 1-row totals join, one 1-row fold. */
  private def q256(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val u = events(s, d).groupBy("user_id").agg(
      sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errs"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("purch"))
    val m = u.agg(count(lit(1)).as("nu"), sum("errs").as("te"),
      sum("purch").as("tp"))
    val flagged = u.crossJoin(broadcast(m)).select(
      when(col("errs").cast(dec) * col("nu").cast(dec) >
        col("te").cast(dec), 1L).otherwise(0L).as("e"),
      when(col("purch").cast(dec) * col("nu").cast(dec) >
        col("tp").cast(dec), 1L).otherwise(0L).as("o"))
    val cells = flagged.agg(
      sum(when(col("e") === 1 && col("o") === 1, 1L).otherwise(0L)).as("a"),
      sum(when(col("e") === 1 && col("o") === 0, 1L).otherwise(0L)).as("b"),
      sum(when(col("e") === 0 && col("o") === 1, 1L).otherwise(0L)).as("c"),
      sum(when(col("e") === 0 && col("o") === 0, 1L).otherwise(0L)).as("dd"))
    val ok = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("dd") > 0
    val or = (col("a").cast("double") * col("dd").cast("double")) /
      (col("b").cast("double") * col("c").cast("double"))
    val se = sqrt(lit(1.0) / col("a").cast("double") +
      lit(1.0) / col("b").cast("double") +
      lit(1.0) / col("c").cast("double") +
      lit(1.0) / col("dd").cast("double"))
    cells.select(col("a"), col("b"), col("c"), col("dd").as("d"),
      Det.r6e(when(ok, or).otherwise(lit(0.0))).as("odds_ratio"),
      Det.r6e(when(ok, exp(log(or) - lit(1.96) * se))
        .otherwise(lit(0.0))).as("ci_lo"),
      Det.r6e(when(ok, exp(log(or) + lit(1.96) * se))
        .otherwise(lit(0.0))).as("ci_hi"))
  }

  /** q257: PERMUTATION ENTROPY of the daily event-rate series per
    * type (round 22 — the ordinal-complexity screen between q226's
    * single changepoint and q233's burstiness: Bandt & Pompe 2002's
    * estimator is rank-based, so it reads a series' STRUCTURE —
    * trending, oscillating, noise — immune to the scale drift that
    * fools moment statistics): over the (type, day) count series in
    * day order, each consecutive triple maps to its ordinal pattern
    * code 4·[c₂>c₁] + 2·[c₃>c₂] + [c₃>c₁] (exact integer comparisons,
    * ties break identically on both engines by > being false), and
    * the entropy of the code distribution is the readout — ~ln 6 for
    * i.i.d. noise, ~0 for a monotone trend. Scale: one scan to the
    * bounded (type, day) grain; lag windows and the entropy fold on
    * that frame only (q245 contract). */
  private def q257(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val triples = daily
      .withColumn("c1", lag(col("c"), 2).over(w))
      .withColumn("c2", lag(col("c"), 1).over(w))
      .where(col("c1").isNotNull)
      .select(col("event_type"),
        (when(col("c2") > col("c1"), 4L).otherwise(0L) +
          when(col("c") > col("c2"), 2L).otherwise(0L) +
          when(col("c") > col("c1"), 1L).otherwise(0L)).as("code"))
    val dist = triples.groupBy("event_type", "code")
      .agg(count(lit(1)).as("cnt"))
    val tot = dist.groupBy("event_type").agg(sum("cnt").as("t"),
      count(lit(1)).as("n_patterns"))
    dist.join(tot, "event_type")
      .groupBy(col("event_type"), col("t").as("n_triples"),
        col("n_patterns"))
      .agg(Det.r6e(-sum(col("cnt").cast("double") / col("t").cast("double") *
        log(col("cnt").cast("double") / col("t").cast("double"))))
        .as("perm_entropy"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q258: KENDALL τ-b between the daily-count series of each event-
    * type PAIR (round 23 — the rank-concordance companion to q240's
    * Spearman DRIFT (one series against its own past) and q236's
    * Mann–Kendall TREND (one series against time): do clicks and
    * purchases move together day-over-day? τ-b is the tie-adjusted
    * pairwise form, and unlike Pearson it reads monotone coupling
    * without assuming linearity): daily counts per type, the 10
    * type-pairs aligned on shared days, then every day-pair i<j
    * classified concordant/discordant/tied by EXACT integer
    * comparisons — C, D, and the tie counts are exact longs; τ-b =
    * (C−D)/√((n₀−t_x)(n₀−t_y)) is one float chain per pair (r6e),
    * all-tied pairs emit 0.0 by rule. Scale: one scan to the bounded
    * (type, day) grain; the pair fan-out is (types² × days²) on that
    * frame, never corpus-sized — broadcast-joined both ways. */
  private def q258(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .transform(Det.pin)
    val a = daily.select(col("event_type").as("type_a"), col("day"),
      col("c").as("ca"))
    val b = daily.select(col("event_type").as("type_b"), col("day"),
      col("c").as("cb"))
    val ser = a.join(b, "day").where(col("type_a") < col("type_b"))
    val x = ser.select(col("type_a"), col("type_b"),
      col("day").as("d1"), col("ca").as("ca1"), col("cb").as("cb1"))
    val y = ser.select(col("type_a"), col("type_b"),
      col("day").as("d2"), col("ca").as("ca2"), col("cb").as("cb2"))
    x.join(y, Seq("type_a", "type_b")).where(col("d1") < col("d2"))
      .groupBy("type_a", "type_b")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when((col("ca2") > col("ca1") && col("cb2") > col("cb1")) ||
          (col("ca2") < col("ca1") && col("cb2") < col("cb1")), 1L)
          .otherwise(0L)).as("n_conc"),
        sum(when((col("ca2") > col("ca1") && col("cb2") < col("cb1")) ||
          (col("ca2") < col("ca1") && col("cb2") > col("cb1")), 1L)
          .otherwise(0L)).as("n_disc"),
        sum(when(col("ca2") === col("ca1"), 1L).otherwise(0L)).as("tx"),
        sum(when(col("cb2") === col("cb1"), 1L).otherwise(0L)).as("ty"))
      .select(col("type_a"), col("type_b"), col("n_pairs"),
        col("n_conc"), col("n_disc"),
        Det.r6e(when(col("n_pairs") > col("tx") &&
          col("n_pairs") > col("ty"),
          (col("n_conc") - col("n_disc")).cast("double") /
            sqrt((col("n_pairs") - col("tx")).cast("double") *
              (col("n_pairs") - col("ty")).cast("double")))
          .otherwise(lit(0.0))).as("tau_b"))
      .transform(Det.emit(_, "type_a", "type_b"))
  }

  /** q260: two-sample CRAMÉR–VON MISES drift statistic per event type
    * (round 23 — the distribution-shape companion to q221's KS (sup
    * of the CDF gap) and q228's Mann–Whitney (location only): CvM
    * integrates the SQUARED CDF gap, so it reads spread/shape drift
    * a median-preserving change hides from both): first-15-days
    * values vs the rest, Anderson's rank form — with rᵢ the combined
    * ranks of sample X and i its within-sample index,
    * U = n·Σ(rᵢ−i)² + m·Σ(sⱼ−j)², T = U/(nmN) − (4nm−1)/(6N). Ranks
    * are row_numbers ordered by (value, event_id) — the declared
    * deterministic tie convention (q152 hash-split precedent: a
    * stable arbitrary tiebreak, identical on any engine) — and every
    * (rᵢ−i)² is an exact long summed in decimal(38,0) (the q245
    * overflow discipline: the sum is O(N³) in the per-type count, past
    * a long at ~2500 eventful days of a 1e5-rows/day type). Scale:
    * one scan, one per-type sort for the two row_numbers (range-
    * partitioned within the type), one fold to 5 rows. */
  private def q260(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, d).select(col("event_type"),
      to_date(col("ts")).as("day"), col("value"), col("event_id"))
    val mn = ev.agg(min("day").as("d0"))
    val t = ev.crossJoin(broadcast(mn))
      .select(col("event_type"),
        (datediff(col("day"), col("d0")) < 15).as("in_x"),
        col("value"), col("event_id"))
    val wAll = Window.partitionBy("event_type")
      .orderBy(col("value"), col("event_id"))
    val wHalf = Window.partitionBy("event_type", "in_x")
      .orderBy(col("value"), col("event_id"))
    val sq = ((col("r") - col("i")) * (col("r") - col("i")))
      .cast("decimal(38,0)")
    val agg = t
      .withColumn("r", row_number().over(wAll).cast("long"))
      .withColumn("i", row_number().over(wHalf).cast("long"))
      .groupBy("event_type")
      .agg(
        sum(when(col("in_x"), 1L).otherwise(0L)).as("n_x"),
        sum(when(!col("in_x"), 1L).otherwise(0L)).as("n_y"),
        sum(when(col("in_x"), sq).otherwise(lit(0).cast("decimal(38,0)")))
          .as("sx"),
        sum(when(!col("in_x"), sq).otherwise(lit(0).cast("decimal(38,0)")))
          .as("sy"))
    val nD = col("n_x").cast("double")
    val mD = col("n_y").cast("double")
    val bigN = (col("n_x") + col("n_y")).cast("double")
    agg.select(col("event_type"), col("n_x"), col("n_y"),
      Det.r6e(
        (col("n_x").cast("decimal(38,0)") * col("sx") +
          col("n_y").cast("decimal(38,0)") * col("sy")).cast("double") /
          (nD * mD * bigN) -
          (lit(4.0) * nD * mD - lit(1.0)) / (lit(6.0) * bigN))
        .as("cvm_t"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q262: THEIL–SEN slope of the daily-count series per event type
    * (round 23 — the robust trend MAGNITUDE beside q236's Mann–
    * Kendall trend DIRECTION test, which shares its pairwise
    * construction: the median of all pairwise slopes shrugs off the
    * outlier days that drag an OLS fit (q197) around, the standard
    * rate-of-change estimate for noisy ingest volumes): day indices
    * by exact datediff from the global first day, every i<j slope one
    * double division of exact longs, and the LOWER MEDIAN selected by
    * row_number over (slope, t1, t2) at rank ⌊(k+1)/2⌋ — the
    * percentile_disc convention (q239), deterministic on any engine
    * with the (t1, t2) tiebreak. Scale: pair fan-out and the median
    * sort live on the bounded (type, day) frame; one scan before it. */
  private def q262(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mn = events(s, d).agg(min(to_date(col("ts"))).as("d0"))
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(mn))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast("long").as("t"), col("c"))
      .transform(Det.pin)
    val x = daily.select(col("event_type"), col("t").as("t1"),
      col("c").as("c1"))
    val y = daily.select(col("event_type"), col("t").as("t2"),
      col("c").as("c2"))
    val slopes = x.join(y, "event_type").where(col("t1") < col("t2"))
      .select(col("event_type"), col("t1"), col("t2"),
        ((col("c2") - col("c1")).cast("double") /
          (col("t2") - col("t1")).cast("double")).as("slope"))
    val k = slopes.groupBy("event_type").agg(count(lit(1)).as("n_pairs"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("slope"), col("t1"), col("t2"))
    slopes.withColumn("rn", row_number().over(w).cast("long"))
      .join(k, "event_type")
      .where(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        Det.r6e(col("slope")).as("sen_slope"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q263: WALD–WOLFOWITZ runs test on the daily-count series per
    * event type (round 23 — the randomness screen beside q233's
    * burstiness (dispersion) and q257's permutation entropy (ordinal
    * mix): too FEW runs of above/below-median days means clumping
    * (outage backfills, batch ingest), too MANY means oscillation
    * (retry storms) — and the z-score says which, signed): the
    * reference level is the LOWER MEDIAN of the counts (row_number at
    * ⌊(n+1)/2⌋ over (c, day) — exact, no interpolation divergence),
    * tie days dropped per the classical test, R = number of maximal
    * same-sign blocks via one lag, and z = (R − E)/√V with
    * E = 1 + 2n₁n₂/n, V = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) — R/n₁/n₂ exact
    * longs, z one float chain (r6e), degenerate variance emits 0.0 by
    * rule. Scale: everything after the first fold lives on the
    * bounded (type, day) frame. */
  private def q263(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .transform(Det.pin)
    val nd = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val wv = Window.partitionBy("event_type").orderBy(col("c"), col("day"))
    val med = daily.withColumn("rn", row_number().over(wv).cast("long"))
      .join(nd, "event_type")
      .where(col("rn") === expr("(n_days + 1) div 2"))
      .select(col("event_type"), col("c").as("med"))
    val wd = Window.partitionBy("event_type").orderBy("day")
    val agg = daily.join(med, "event_type")
      .where(col("c") =!= col("med"))
      .select(col("event_type"), col("day"), (col("c") > col("med")).as("up"))
      .withColumn("prev", lag(col("up"), 1).over(wd))
      .groupBy("event_type")
      .agg(
        sum(when(col("prev").isNull || col("prev") =!= col("up"), 1L)
          .otherwise(0L)).as("n_runs"),
        sum(when(col("up"), 1L).otherwise(0L)).as("n_above"),
        sum(when(!col("up"), 1L).otherwise(0L)).as("n_below"))
    val n1 = col("n_above").cast("double")
    val n2 = col("n_below").cast("double")
    val n = n1 + n2
    val e = lit(1.0) + lit(2.0) * n1 * n2 / n
    val v = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n) /
      (n * n * (n - lit(1.0)))
    agg.select(col("event_type"), col("n_runs"), col("n_above"),
      col("n_below"),
      Det.r6e(when(col("n_above") > 0 && col("n_below") > 0 &&
        n > lit(1.0) && v > lit(0.0),
        (col("n_runs").cast("double") - e) / sqrt(v))
        .otherwise(lit(0.0))).as("z"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q264: PAGE–HINKLEY drift statistic per event type (round 23 —
    * the sequential mean-drift monitor between q226's CUSUM (argmax
    * deviation from the GLOBAL mean — a retrospective split) and
    * s50's streaming CUSUM: PH tracks deviation from the MEAN-TO-
    * DATE, so it reads a slow upward ramp that the global-mean form
    * dilutes; PH_t = m_t − min_{i≤t} m_i with m_t = Σ(x_i − x̄_i),
    * the classic sequential formulation with δ = 0): over the dense
    * daily spine (q226 discipline — a missing day is a zero), the
    * prefix counts are exact longs; the m-chain is a sequential
    * double fold in day order — deterministic on any engine that
    * folds cumulative frames in frame order (the q31 running-sum
    * precedent) — and the argmax day breaks ties earliest-first.
    * Scale: one map-side-combinable (type, day) aggregate; all
    * windows on the bounded types×days spine. */
  private def q264(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .transform(Det.pin)
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val types = ev.agg(sort_array(collect_set("event_type")).as("tps"))
    val spine = broadcast(bounds)
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(broadcast(types))
      .select(col("day"), explode(col("tps")).as("event_type"))
    val cells = spine
      .join(ev.groupBy("event_type", "day").agg(count(lit(1)).as("cnt")),
        Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("cnt"))
    val wc = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ph = cells
      .withColumn("i", row_number().over(
        Window.partitionBy("event_type").orderBy("day")).cast("long"))
      .withColumn("pre", sum("cnt").over(wc))
      .withColumn("term", col("cnt").cast("double") -
        col("pre").cast("double") / col("i").cast("double"))
      .withColumn("m", sum("term").over(wc))
      .withColumn("mmin", min("m").over(wc))
      .withColumn("ph", col("m") - col("mmin"))
    ph.groupBy("event_type")
      .agg(
        max(struct(col("ph").as("p"), (-col("i")).as("ni"),
          col("day").as("dy"))).as("mx"),
        count(lit(1)).as("n_days"), sum("cnt").as("total"))
      .select(col("event_type"), col("n_days"), col("total"),
        date_format(col("mx.dy"), "yyyy-MM-dd").as("ph_day"),
        Det.r6e(col("mx.p")).as("ph_max"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q266: DAY-OF-WEEK seasonality strength per event type — ANOVA
    * η² of weekday on daily counts (round 23 — the effect-size
    * companion to q213's seasonal-cell SCREEN: q213 flags which
    * (type, hour) cells run hot against their own baseline; η² =
    * SS_between/SS_total says how much of a type's daily variance the
    * weekly cycle explains at all — the number that decides whether a
    * drift monitor needs weekday-conditioned baselines or can use
    * q131's global one): dense daily spine (missing day = 0), dow =
    * 0..6 Sunday-first on BOTH engines (Spark dayofweek()−1, DuckDB
    * date_part('dow')), all sums exact (Σc² in decimal(38,0), the
    * q245 overflow discipline), η² and the peak weekday's mean one
    * float chain over the ≤7-group frame (r6e absorbs the bounded
    * fold); zero total variance → 0.0 by rule, peak ties break on the
    * lowest dow. Scale: one (type, day) aggregate; everything after
    * on the types×7 frame. */
  private def q266(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    def dm(c: Column) = c.cast(dec)
    val ev = events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .transform(Det.pin)
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val types = ev.agg(sort_array(collect_set("event_type")).as("tps"))
    val spine = broadcast(bounds)
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(broadcast(types))
      .select(col("day"), explode(col("tps")).as("event_type"))
    val cells = spine
      .join(ev.groupBy("event_type", "day").agg(count(lit(1)).as("cnt")),
        Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("dow", (dayofweek(col("day")) - 1).cast("long"))
    val groups = cells.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("ng"), sum("cnt").as("sg"))
    val tot = cells.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum("cnt").as("st"),
      sum(dm(col("cnt")) * dm(col("cnt"))).as("ss2"))
    val ssb = groups.groupBy("event_type").agg(
      sum(col("sg").cast("double") * col("sg").cast("double") /
        col("ng").cast("double")).as("ssb_num"))
    val peak = groups
      .groupBy("event_type")
      .agg(max(struct(
        (col("sg").cast("double") / col("ng").cast("double")).as("mean"),
        (-col("dow")).as("nd"), col("dow").as("dw"))).as("pk"))
    val grand = col("st").cast("double") * col("st").cast("double") /
      col("n").cast("double")
    tot.join(ssb, "event_type").join(peak, "event_type")
      .select(col("event_type"), col("n").as("n_days"),
        col("st").as("total"),
        Det.r6e(when(col("ss2").cast("double") - grand > 0.0,
          (col("ssb_num") - grand) /
            (col("ss2").cast("double") - grand))
          .otherwise(lit(0.0))).as("eta2"),
        col("pk.dw").as("peak_dow"),
        Det.r6e(col("pk.mean")).as("peak_mean"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q267: STATE DWELL & DOMINANT FLOW per event type (round 23 —
    * the stickiness readout of q132's transition matrix: q132 emits
    * every p(dst|src); this collapses each source state to the three
    * numbers a journey designer reads — how often the state repeats
    * (self-loop probability), the geometric expected dwell
    * 1/(1−p_self) in events, and where traffic goes when it finally
    * leaves (the dominant non-self destination)): transitions are
    * q132's construction verbatim (per-user lead over (second-
    * truncated ts, event_id)); all counts exact longs, the two floats
    * one chain each (r6e); an absorbing state (all transitions self)
    * emits dwell 0.0 by rule and an empty destination. Scale: one
    * per-user sequence window over the corpus (the q132 shuffle),
    * then everything on the ≤ V² transition frame. */
  private def q267(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tsec"), col("event_id"))
    val tr = events(s, d)
      .withColumn("tsec", date_trunc("second", col("ts")))
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .where(col("dst").isNotNull)
      .select(col("event_type").as("src"), col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
      .transform(Det.pin)
    val rs = tr.groupBy("src").agg(sum("cnt").as("r"))
    val self = tr.where(col("src") === col("dst"))
      .select(col("src"), col("cnt").as("c_self"))
    val wTop = Window.partitionBy("src")
      .orderBy(col("cnt").desc, col("dst").asc)
    val top = tr.where(col("src") =!= col("dst"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") === 1)
      .select(col("src"), col("dst").as("top_dst"),
        col("cnt").as("top_cnt"))
    rs.join(self, Seq("src"), "left")
      .join(top, Seq("src"), "left")
      .select(col("src"), col("r").as("n_out"),
        coalesce(col("c_self"), lit(0L)).as("n_self"),
        Det.r6e(coalesce(col("c_self"), lit(0L)).cast("double") /
          col("r").cast("double")).as("p_self"),
        Det.r6e(when(col("r") > coalesce(col("c_self"), lit(0L)),
          col("r").cast("double") /
            (col("r") - coalesce(col("c_self"), lit(0L))).cast("double"))
          .otherwise(lit(0.0))).as("expected_dwell"),
        coalesce(col("top_dst"), lit("")).as("top_dst"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"))
      .transform(Det.emit(_, "src"))
  }

  /** q268: HOUR-OF-DAY SHAPE divergence per event type — JSD against
    * the global diurnal profile (round 23 — the shape-DISTANCE
    * summary of q213's seasonal-cell screen: q213 flags which (type,
    * hour) cells run hot, this says how far each type's whole 24-hour
    * profile sits from the traffic-wide one, the number that ranks
    * "error is a night job, view follows the site curve" in one
    * sort): exact (type, hr) and global-hr counts; JSD in nats via
    * the two-KL form ½Σp·ln(p/m) + ½Σq·ln(q/m), m = (p+q)/2, zero
    * cells contributing zero by the p>0 / q>0 guards — so only the
    * OBSERVED (type, hr) ∪ (global hr × types) frame is ever built
    * (≤ 24·types rows); peak hour argmax ties lowest-first, exact.
    * Scale: one corpus scan to the (type, hr) grain; everything
    * after on the bounded 24×types frame. */
  private def q268(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
      .transform(Det.pin)
    val glob = cells.groupBy("hr").agg(sum("c").as("g"))
    val nt = cells.groupBy("event_type").agg(sum("c").as("n"))
    val ng = cells.agg(sum("c").as("ntot"))
    val frame = nt.crossJoin(broadcast(glob))
      .join(cells, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"), col("n"), col("g"),
        coalesce(col("c"), lit(0L)).as("c"))
      .crossJoin(broadcast(ng))
    val p = col("c").cast("double") / col("n").cast("double")
    val q = col("g").cast("double") / col("ntot").cast("double")
    val m = (p + q) / lit(2.0)
    val jsd = frame.groupBy("event_type")
      .agg((sum(when(col("c") > 0, p * log(p / m)).otherwise(lit(0.0))) /
        lit(2.0) +
        sum(when(col("g") > 0, q * log(q / m)).otherwise(lit(0.0))) /
          lit(2.0)).as("jsd"))
    val peak = cells.groupBy("event_type")
      .agg(max(struct(col("c").as("cc"), (-col("hr")).as("nh"),
        col("hr").as("h"))).as("pk"))
    nt.join(jsd, "event_type").join(peak, "event_type")
      .select(col("event_type"), col("n").as("n_events"),
        col("pk.h").as("peak_hr"), Det.r6e(col("jsd")).as("jsd"))
      .transform(Det.emit(_, "event_type"))
  }

  /** q269: RETENTION HALF-LIFE per daily cohort (round 23 — the
    * single-number collapse of q125's retention triangle: the first
    * day-offset on which fewer than half the cohort is still active;
    * the number growth reporting quotes and cohort comparisons sort
    * by): q125's construction (first-seen day per user, distinct
    * activity per offset), then a DENSE offset spine 1..(dmax −
    * cohort_day) per cohort — a missing offset IS a zero-retention
    * day and can be the half-life, so the spine is load-bearing, and
    * it is built only for cohorts with at least one later day (the
    * engines disagree on empty sequence construction); the decision
    * is the EXACT integer compare 2·retained < n_users, ties
    * earliest; a cohort never dropping below half (or with no later
    * days) emits −1/0 by rule. Scale: the (user, day) dedup and
    * first-seen aggregate shuffle on user_id (q125 shape); the spine
    * and the argmin live on the bounded cohorts×days frame. */
  private def q269(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val dmax = ev.agg(max("day").as("d1"))
    val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = first.groupBy("cohort_day")
      .agg(count(lit(1)).as("n_users"))
    val act = ev.distinct().join(first, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("k"))
      .where(col("k") >= 1)
      .groupBy("cohort_day", "k")
      .agg(count(lit(1)).as("retained"))
    val spine = sizes.crossJoin(broadcast(dmax))
      .where(datediff(col("d1"), col("cohort_day")) >= 1)
      .select(col("cohort_day"), col("n_users"),
        explode(expr("sequence(CAST(1 AS BIGINT), CAST(datediff(d1, cohort_day) AS BIGINT))"))
          .as("k"))
    val below = spine.join(act, Seq("cohort_day", "k"), "left")
      .select(col("cohort_day"), col("n_users"), col("k"),
        coalesce(col("retained"), lit(0L)).as("retained"))
      .where(col("retained") * 2 < col("n_users"))
      .groupBy("cohort_day")
      .agg(min(struct(col("k").as("kk"), col("retained").as("r"))).as("hl"))
    sizes.join(below, Seq("cohort_day"), "left")
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("n_users"),
        coalesce(col("hl.kk"), lit(-1L)).as("half_life"),
        coalesce(col("hl.r"), lit(0L)).as("retained_at_hl"))
      .transform(Det.emit(_, "cohort_day"))
  }

  /** q270: DAY-OVER-DAY USER TURNOVER (round 23 — the user-BASE
    * continuity readout beside q141's rolling WAU (a volume curve)
    * and q125's cohort triangle (anchored at first touch): the
    * Jaccard of consecutive days' active-user SETS distinguishes a
    * stable community from equal-sized churning traffic that the
    * volume curve cannot tell apart): exact distinct (user, day),
    * per-day actives, the self-join on day+1 counting users active
    * BOTH days; Jaccard and next-day carryover one float chain each
    * (r6e), rows emitted for observed consecutive-day pairs. Scale:
    * the dedup and the day+1 self-join both shuffle on user_id
    * (co-located); the day rollup is calendar-sized. */
  private def q270(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .transform(Det.pin)
    val perDay = ud.groupBy("day").agg(count(lit(1)).as("n_active"))
    val common = ud.as("a")
      .join(ud.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.day") === date_add(col("a.day"), 1))
      .groupBy(col("a.day").as("day"))
      .agg(count(lit(1)).as("n_common"))
    val nxt = perDay.select(date_sub(col("day"), 1).as("day"),
      col("n_active").as("n_next"))
    perDay.join(nxt, "day").join(common, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_active"), col("n_next"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("jaccard", Det.r6e(col("n_common").cast("double") /
        (col("n_active") + col("n_next") - col("n_common")).cast("double")))
      .withColumn("carryover", Det.r6e(col("n_common").cast("double") /
        col("n_active").cast("double")))
      .transform(Det.emit(_, "day"))
  }

  /** q237: LOG-RANK test between two retention cohorts (round 19 —
    * q234's comparative companion: the KM curve describes ONE
    * cohort's survival; "do the two variants retain differently?" is
    * the log-rank question, the survival-analysis standard for
    * comparing censored lifetimes; cohort = user_id parity, q235's
    * declared assignment): same lifetime/censoring construction as
    * q234 (purchase lifetimes, all-events observation edge — the
    * round-13 derivation that gives the oracle real risk sets),
    * then at each pooled death time the hypergeometric
    * expectation — O₁ = Σd₁ stays an EXACT integer; E₁ = Σ d·n₁/n
    * and V = Σ d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1) are float sums of
    * exact-rational terms over the BOUNDED lifetime frame (r6e
    * absorbs fold-order freedom, the q207 precedent); the n = 1
    * variance term is zero by rule. χ² = (O₁−E₁)²/V display-only.
    * All risk sets are the q234 suffix-count subtraction — per
    * cohort and pooled, integers throughout. Scale: one scan to the
    * user grain, one (lifetime)-grain conditional rollup, windows
    * over the bounded frame, a 1-row totals broadcast. */
  private def q237(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val evAll = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"))
    val mx = evAll.agg(max("day").as("dmax"))
    val users = evAll.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min("day").as("f"), max("day").as("l"))
      .crossJoin(broadcast(mx))
      .select(datediff(col("l"), col("f")).cast("long").as("t"),
        (datediff(col("dmax"), col("l")) < 7).as("censored"),
        (col("user_id") % 2).cast("int").as("g"))
      .transform(Det.pin)
    val g = users.groupBy("t").agg(
      sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("m"),
      sum(when(!col("censored") && col("g") === 1, 1L).otherwise(0L))
        .as("d1"),
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("m1"))
    val tot = users.agg(count(lit(1)).as("ntot"),
      sum(when(col("g") === 1, 1L).otherwise(0L)).as("n1tot"))
    val wc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val deaths = g
      .withColumn("cm", sum("m").over(wc))
      .withColumn("cm1", sum("m1").over(wc))
      .crossJoin(broadcast(tot))
      .withColumn("n", col("ntot") - col("cm") + col("m"))
      .withColumn("n1", col("n1tot") - col("cm1") + col("m1"))
      .where(col("d") > 0)
    val dd = col("d").cast("double"); val nd = col("n").cast("double")
    val n1d = col("n1").cast("double")
    val e1t = (dd * n1d) / nd
    val vt = when(col("n") > 1L,
      ((dd * n1d) / nd * (lit(1.0) - n1d / nd)) *
        ((nd - dd) / (nd - lit(1.0)))).otherwise(lit(0.0))
    // totals come from the broadcast, sums coalesce — a corpus whose
    // every lifetime is censored (no death times at all) still reads
    // as one zeroed row, never an all-null one
    val agg = deaths
      .agg(coalesce(sum("d"), lit(0L)).as("deaths"),
        coalesce(sum("d1"), lit(0L)).as("o1"),
        coalesce(sum(e1t), lit(0.0)).as("e1"),
        coalesce(sum(vt), lit(0.0)).as("v"))
      .crossJoin(broadcast(tot))
      .select(col("ntot").as("n_users"), col("n1tot").as("n_g1"),
        col("deaths"), col("o1"), col("e1"), col("v"))
    agg.select(col("n_users"), col("n_g1"), col("deaths"), col("o1"),
      Det.r6e(col("e1")).as("e1"), Det.r6e(col("v")).as("v"),
      Det.r6e(when(col("v") > 0.0,
        (col("o1").cast("double") - col("e1")) *
          (col("o1").cast("double") - col("e1")) / col("v"))
        .otherwise(lit(0.0))).as("chi2"))
  }

  /** q235: CUPED experiment readout (round 19 — the A/B-test
    * variance-reduction standard: adjust the post-period metric by
    * the PRE-period covariate, Y' = Y − θ(X − X̄), shrinking variance
    * by the squared correlation — every experimentation platform's
    * default readout; here variant = user_id parity, the fixture's
    * declared assignment, X/Y = purchase cents before/since the
    * mid-window split): θ = cov(X,Y)/var(X) from EXACT integer
    * moments — θ's numerator n·Σxy − Σx·Σy and denominator
    * n·Σx² − (Σx)² in decimal(38,0) (the q214/q217 discipline; the
    * user-grain frame is small enough that decimal aggregation
    * costs nothing here, unlike q232's 6M-row fold), ONE division to
    * double each; lifts and the ρ² variance-reduction ratio are
    * display floats from those exact integers in mirrored op order.
    * Scale: one event scan to the user grain, ONE 1-row moments
    * aggregate (conditional sums fold both variants in the same
    * pass), no join at all. */
  private def q235(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    def dm(c: org.apache.spark.sql.Column) = c.cast(dec)
    val ev = events(s, d).select(col("user_id"),
      (to_date(col("ts")) < lit("2024-01-16").cast("date")).as("pre"),
      when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
    val users = ev.groupBy("user_id").agg(
        sum(when(col("pre"), col("cents")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("cents")).otherwise(0L)).as("y"))
      .withColumn("v", (col("user_id") % 2).cast("int"))
    val m = users.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(dm(col("x")) * dm(col("x"))).as("sxx"),
      sum(dm(col("x")) * dm(col("y"))).as("sxy"),
      sum(dm(col("y")) * dm(col("y"))).as("syy"),
      sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("v") === 1, col("x")).otherwise(0L)).as("sx1"),
      sum(when(col("v") === 1, col("y")).otherwise(0L)).as("sy1"),
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("v") === 0, col("x")).otherwise(0L)).as("sx0"),
      sum(when(col("v") === 0, col("y")).otherwise(0L)).as("sy0"))
    val numxy = dm(col("n")) * col("sxy") - dm(col("sx")) * dm(col("sy"))
    val denx = dm(col("n")) * col("sxx") - dm(col("sx")) * dm(col("sx"))
    val deny = dm(col("n")) * col("syy") - dm(col("sy")) * dm(col("sy"))
    val theta = numxy.cast("double") / denx.cast("double")
    val rawLift = (col("sy1").cast("double") / col("n1").cast("double")
      - col("sy0").cast("double") / col("n0").cast("double")) / lit(100.0)
    val xGap = (col("sx1").cast("double") / col("n1").cast("double")
      - col("sx0").cast("double") / col("n0").cast("double")) / lit(100.0)
    m.select(col("n").as("n_users"), col("n1"), col("n0"),
      Det.r6e(theta).as("theta"),
      Det.r4e(rawLift).as("raw_lift"),
      Det.r4e(rawLift - theta * xGap).as("adj_lift"),
      Det.r6e((numxy.cast("double") * numxy.cast("double")) /
        (denx.cast("double") * deny.cast("double"))).as("var_reduction"))
  }

  /** q236: MANN–KENDALL trend test per event type (round 19 — the
    * monotone-trend companion completing the time-series screen
    * triad: q213 finds SEASONAL anomalies, q226 finds LEVEL SHIFTS,
    * this asks "is the daily rate drifting up or down at all?" —
    * distribution-free, the hydrology/monitoring standard): over the
    * dense daily spine (q226's cells — zero days are real
    * observations), S = Σ_{i<j} sign(c_j − c_i) as an exact integer
    * from the per-type pairwise self-join of the BOUNDED spine
    * (calendar-bounded quadratic: 10 years ≈ 13M pairs per type —
    * fine; far past that, the O(n log n) inversion-count form is the
    * documented successor), the tie-corrected variance numerator
    * n(n−1)(2n+5) − Σt(t−1)(2t+5) exact (n ≤ days, Long-safe to
    * ~1.5M days), and the continuity-corrected z = (S∓1)/√(var) a
    * display float from those integers. Scale: the self-join keys on
    * event_type but both sides are the bounded cells frame; the tie
    * rollup is a (type, count)-grain aggregate. */
  private def q236(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .transform(Det.pin)
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val types = ev.agg(sort_array(collect_set("event_type")).as("tps"))
    val spine = broadcast(bounds)
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(broadcast(types))
      .select(col("day"), explode(col("tps")).as("event_type"))
    val dayCnt = ev.groupBy("event_type", "day")
      .agg(count(lit(1)).as("cnt"))
    val cells = spine.join(dayCnt, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("cnt")).transform(Det.pin)
    val a = cells.select(col("event_type"), col("day").as("di"),
      col("cnt").as("ci"))
    val b = cells.select(col("event_type"), col("day").as("dj"),
      col("cnt").as("cj"))
    val sstat = a.join(b, Seq("event_type"))
      .where(col("di") < col("dj"))
      .groupBy("event_type")
      .agg(sum(when(col("cj") > col("ci"), 1L)
        .when(col("cj") < col("ci"), -1L).otherwise(0L)).as("s_stat"))
    val ties = cells.groupBy("event_type", "cnt")
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
          .as("tsum"),
        sum(col("t")).as("n"))
    val varNum = col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
      col("tsum")
    val z = when(varNum === 0L, lit(0.0))
      .when(col("s_stat") > 0L,
        (col("s_stat").cast("double") - lit(1.0)) /
          sqrt(varNum.cast("double") / lit(18.0)))
      .when(col("s_stat") < 0L,
        (col("s_stat").cast("double") + lit(1.0)) /
          sqrt(varNum.cast("double") / lit(18.0)))
      .otherwise(lit(0.0))
    sstat.join(ties, "event_type")
      .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
        varNum.as("var_num"), Det.r6e(z).as("z"))
      .transform(Det.emit(_, "event_type"))
  }

  private def q215(s: SparkSession, d: String): DataFrame = {
    val pats = Seq("view>click>purchase>", "error>error>",
      "signup>purchase>")
    val sess = graft.operators.Sessionize.assign(
        events(s, d).withColumn("tsec", date_trunc("second", col("ts"))),
        "user_id", "tsec", gapSec = 1800L, orderCols = Seq("event_id"))
    sess.groupBy("user_id", "sess")
      .agg(array_sort(collect_list(struct(
        col("tsec").cast("long").as("t"), col("event_id").as("e"),
        col("event_type").as("ty")))).as("evs"))
      .select(col("user_id"), concat(
        array_join(expr("transform(evs, x -> x.ty)"), ">"), lit(">"))
        .as("seq"))
      .withColumn("pattern", explode(array(pats.map(lit): _*)))
      .withColumn("occ", expr(
        "cast((length(seq) - length(replace(seq, pattern, '')))" +
          " div length(pattern) as bigint)"))
      .groupBy("pattern")
      .agg(sum("occ").as("n_occ"),
        sum(when(col("occ") > 0L, 1L).otherwise(0L)).as("n_sessions"),
        countDistinct(when(col("occ") > 0L, col("user_id")))
          .as("n_users"))
      .transform(Det.emit(_, "pattern"))
  }

  /** q216: FUNNEL LATENCY profile (round 17 — the statistic q116's
    * anchors exist to feed: not just WHO converts but HOW FAST): per
    * funnel transition, users reaching the source stage, users
    * converting to the target, the conversion rate, and exact
    * latency stats (mean / exact median / max seconds between the
    * strict-order anchors). Scale: Funnel.strictOrder's join–agg
    * cascade (one user-keyed shuffle per stage); the latency frame is
    * user-grain; the median goes through DistributedRank (q29
    * machinery — no transition's latencies ever sit on one task);
    * latencies are exact integer seconds on second-truncated anchors.
    * Floats: avg/rate r4e'd; the median is integer-valued or an
    * exact midpoint (the q206 quantile contract). */
  private def q216(s: SparkSession, d: String): DataFrame = {
    val stages = Seq("view", "click", "purchase")
    val f = graft.operators.Funnel.strictOrder(
      events(s, d).withColumn("tsec", date_trunc("second", col("ts"))),
      "user_id", "event_type", "tsec", stages)
      .transform(Det.pin)
    val diffs = stages.sliding(2).map { case Seq(a, b) =>
      f.select(lit(s"$a->$b").as("transition"),
        col(s"t_$a").isNotNull.cast("long").as("reached"),
        col(s"t_$b").isNotNull.cast("long").as("conv"),
        (unix_timestamp(col(s"t_$b")) - unix_timestamp(col(s"t_$a")))
          .as("lat_s"))
    }.reduce(_ unionByName _).transform(Det.pin)
    val agg = diffs.groupBy("transition").agg(
      sum("reached").as("n_reached"), sum("conv").as("n_converted"),
      Det.r4e(avg("lat_s")).as("avg_s"), max("lat_s").as("max_s"))
    val med = graft.operators.DistributedRank.quantiles(
        diffs.where(col("lat_s").isNotNull)
          .select(col("transition"), col("lat_s").cast("double")),
        Seq("transition"), "lat_s", Seq("p50" -> 0.5), adaptiveCut = 0)
      .select(col("transition"), Det.r4e(col("p50")).as("p50_s"))
    // LEFT join: med derives from the lat-notnull FILTERED frame, so a
    // transition with zero conversions exists in `agg` but not `med` —
    // an inner join would drop the row the oracle emits with NULL p50
    agg.join(med, Seq("transition"), "left")
      .withColumn("conv_rate", Det.r4e(
        col("n_converted").cast("double") / col("n_reached")))
      .select(col("transition"), col("n_reached"), col("n_converted"),
        col("conv_rate"), col("avg_s"), col("p50_s"), col("max_s"))
      .transform(Det.emit(_, "transition"))
  }

  private def q144(s: SparkSession, d: String): DataFrame = {
    val sess = graft.operators.Sessionize.assign(
        events(s, d).withColumn("tsec", date_trunc("second", col("ts"))),
        "user_id", "tsec", gapSec = 1800L, orderCols = Seq("event_id"))
      .select(col("user_id"), col("sess"), col("event_type"))
      .distinct()
    val ns = sess.select("user_id", "sess").distinct()
      .agg(count(lit(1)).cast("double").as("ns"))
    val tc = sess.groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("ct"))
    val pairs = sess.as("a")
      .join(sess.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.sess") === col("b.sess") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(tc.select(col("t").as("ta"), col("ct").as("ca"))), "ta")
      .join(broadcast(tc.select(col("t").as("tb"), col("ct").as("cb"))), "tb")
      .crossJoin(broadcast(ns))
      .select(col("ta"), col("tb"), col("n_both"),
        Det.r4e((col("n_both") / col("ns")) /
          ((col("ca") / col("ns")) * (col("cb") / col("ns")))).as("lift"))
      .transform(Det.emit(_, "ta", "tb"))
  }

  /** q141: rolling 7-day active users — for every day with activity,
    * distinct users over [d−6, d] (the WAU-per-day engagement curve).
    * A `count(distinct) over (range 7 days)` window re-deduplicates
    * every frame and pins each frame's multiset on one task; the
    * scale-honest shape: dedup (user, day) once [user-keyed shuffle],
    * fan each pair out to the ≤ 7 window-end days it contributes to
    * (map-side explode — bounded ×7, no join), dedup (user, window)
    * [second bounded shuffle], count on the bounded day key. Window
    * ends are clipped to observed activity days so the curve has no
    * trailing phantom days. */
  private def q141(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val maxDay = ud.agg(max("day").as("max_day"))
    val perWindow = ud.crossJoin(broadcast(maxDay))
      .select(col("user_id"), explode(expr(
        "sequence(day, least(date_add(day, 6), max_day))")).as("wday"))
      .distinct()
    val activeDays = ud.select(col("day").as("wday")).distinct()
    perWindow.join(activeDays, "wday")
      .groupBy("wday").agg(count(lit(1)).as("wau"))
      .select(date_format(col("wday"), "yyyy-MM-dd").as("day"), col("wau"))
      .transform(Det.emit(_, "day"))
  }

  /** q139: week-over-week retention — per ISO week, how many of the
    * previous week's active users returned (count + rate): the
    * engagement metric next to q125's cohort triangle (which anchors
    * on FIRST-seen day; this anchors on consecutive activity). Scale
    * shape: the (user, week) dedup shuffles on user_id; the
    * consecutive-week self-join keys on (user_id, week+7d) — an
    * equi-join co-located with the dedup's exchange; weekly totals
    * land on the bounded week key and join back on it. */
  private def q139(s: SparkSession, d: String): DataFrame = {
    val uw = events(s, d)
      .select(date_trunc("week", col("ts")).as("wk"), col("user_id"))
      .distinct()
    val perWeek = uw.groupBy("wk").agg(count(lit(1)).as("n_active"))
    val retained = uw.as("prv")
      .join(uw.as("cur"),
        col("prv.user_id") === col("cur.user_id") &&
          col("cur.wk") === col("prv.wk") + expr("interval 7 days"))
      .groupBy(col("cur.wk").as("wk"))
      .agg(count(lit(1)).as("n_retained"))
    val prevTotals = perWeek.select(
      (col("wk") + expr("interval 7 days")).as("wk"),
      col("n_active").as("n_prev"))
    perWeek.join(retained, "wk").join(prevTotals, "wk")
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
        col("n_prev"), col("n_active"), col("n_retained"),
        Det.r4e(col("n_retained") / col("n_prev")).as("retention"))
      .transform(Det.emit(_, "week"))
  }

  /** q140: per-user behavioral feature vector — event counts by type
    * (fixed-domain conditional aggregation, the wide pivot of q46's
    * shape), total value, active-day count, and last-seen time: the
    * feature-engineering scan an ML pipeline materializes per entity.
    * ONE user_id-keyed aggregate computes every feature (conditional
    * sums are map-side partials; the distinct-day count is the only
    * expanding aggregate); no joins, no second pass. */
  private def q140(s: SparkSession, d: String): DataFrame = {
    def cnt(t: String) =
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
    events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        cnt("view"), cnt("click"), cnt("purchase"),
        cnt("signup"), cnt("error"),
        round(sum("value"), 2).as("total_value"),
        countDistinct(to_date(col("ts"))).as("active_days"),
        unix_timestamp(date_trunc("second", max(col("ts"))))
          .as("last_seen_s"))
      .transform(Det.emitWide(_, "user_id"))
  }

  /** q137: cumulative-user growth curve — new users per day (first-
    * seen day) and the running total of distinct users ever seen: the
    * adoption/coverage curve a corpus or product report leads with.
    * A naive `count(distinct user) over (order by day)` re-scans every
    * prefix; here the first-seen aggregate shuffles ONCE on the
    * high-cardinality user_id, the per-day counts land on the bounded
    * day key, and the running sum's window runs over CALENDAR-sized
    * rows (one per day) — fine on one task at any corpus scale. */
  private def q137(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum("new_users").over(w))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("new_users"), col("cum_users"))
      .transform(Det.emitWide(_, "day"))
  }

  val oracles: Map[String, String] = Map(
    "q125_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, day FROM ev)
         SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
                CAST(date_diff('day', f.cohort_day, a.day) AS INT) AS day_offset,
                CAST(count(1) AS BIGINT) AS n_users
         FROM a JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q126_skew_profile" ->
      """WITH c AS (SELECT user_id, CAST(count(1) AS BIGINT) AS cnt
                    FROM events GROUP BY user_id),
         s AS (SELECT round(quantile_cont(cnt, 0.5) + 0.00000123, 4) AS p50_cnt,
                      max(cnt) AS max_cnt,
                      CAST(sum(cnt) AS DOUBLE) AS tot FROM c)
         SELECT user_id, cnt,
                round(cnt / tot + 0.0000000123, 6) AS share,
                p50_cnt, max_cnt,
                round(max_cnt / p50_cnt + 0.00000123, 4) AS skew
         FROM c, s ORDER BY cnt DESC, user_id ASC LIMIT 20""",
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
         FROM g ORDER BY event_id""",
    "q205_interarrival" ->
      """WITH g AS (SELECT event_type,
                           CAST(floor(epoch(ts)) AS BIGINT) -
                           CAST(floor(epoch(lag(ts, 1) OVER (
                             PARTITION BY user_id
                             ORDER BY ts ASC, event_id ASC))) AS BIGINT) AS gap_s
                    FROM events),
          gg AS (SELECT event_type, CAST(gap_s AS BIGINT) AS gap_s
                 FROM g WHERE gap_s IS NOT NULL)
          SELECT event_type, CAST(count(1) AS BIGINT) AS n_gaps,
                 round(avg(gap_s) + 0.00000123, 4) AS avg_gap_s,
                 max(gap_s) AS max_gap_s,
                 round(quantile_cont(CAST(gap_s AS DOUBLE), 0.5) + 0.00000123, 4)
                   AS p50_gap_s
          FROM gg GROUP BY event_type ORDER BY event_type""",
    // q212: q144's session arithmetic (second-truncated epoch, 1800 s
    // strict gap, event_id tie-break), then first_value/lag inside the
    // (user, sess) window.
    "q212_attribution" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, value,
                            CAST(floor(epoch(date_trunc('second', ts)))
                                 AS BIGINT) AS tsec
                     FROM events),
          b AS (SELECT *, CASE WHEN tsec - lag(tsec) OVER (
                            PARTITION BY user_id
                            ORDER BY tsec ASC, event_id ASC) > 1800
                          THEN 1 ELSE 0 END AS brk
                FROM e),
          sesh AS (SELECT *, sum(brk) OVER (
                     PARTITION BY user_id ORDER BY tsec ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS sess
                   FROM b),
          tg AS (SELECT event_type, value,
                        first_value(event_type) OVER ws AS first_touch,
                        lag(event_type) OVER ws AS prev_type
                 FROM sesh
                 WINDOW ws AS (PARTITION BY user_id, sess
                               ORDER BY tsec ASC, event_id ASC))
          SELECT first_touch, coalesce(prev_type, 'entry') AS last_touch,
                 CAST(count(1) AS BIGINT) AS n_purchases,
                 round(sum(value) + ${Det.E2}, 2) AS revenue
          FROM tg WHERE event_type = 'purchase'
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // q213: dense day×hour×type spine; the hot decision is the exact
    // integer compare cnt·n_cells > 2·sum_cnt on both engines.
    "q213_seasonal_anomaly" ->
      s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
                            CAST(hour(ts) AS INT) AS hr
                     FROM events),
          bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
          days AS (SELECT CAST(unnest(generate_series(d0, d1,
                            INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
          hrs AS (SELECT CAST(unnest(range(24)) AS INT) AS hr),
          tps AS (SELECT DISTINCT event_type FROM e),
          cellcnt AS (SELECT event_type, day, hr,
                             CAST(count(1) AS BIGINT) AS cnt
                      FROM e GROUP BY 1, 2, 3),
          spine AS (SELECT t.event_type, d.day, h.hr
                    FROM days d, hrs h, tps t),
          cells AS (SELECT s.event_type, s.day, s.hr,
                           coalesce(c.cnt, 0) AS cnt
                    FROM spine s LEFT JOIN cellcnt c
                      USING (event_type, day, hr)),
          st AS (SELECT event_type, hr,
                        CAST(count(1) AS BIGINT) AS n_cells,
                        CAST(sum(cnt) AS BIGINT) AS sum_cnt,
                        max(cnt) AS max_cnt
                 FROM cells GROUP BY 1, 2)
          SELECT c.event_type, c.hr,
                 max(st.n_cells) AS n_cells,
                 round(max(st.sum_cnt) / CAST(max(st.n_cells) AS DOUBLE)
                       + ${Det.E4}, 4) AS avg_cnt,
                 max(st.max_cnt) AS max_cnt,
                 CAST(sum(CASE WHEN c.cnt * st.n_cells > 2 * st.sum_cnt
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
          FROM cells c JOIN st USING (event_type, hr)
          GROUP BY 1, 2 ORDER BY 1, 2""",
    // q226: same dense day spine; the argmax decision is the exact
    // integer |n·prefix − i·total| with the earliest-day tie-break.
    "q226_cusum_changepoint" ->
      s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day
                     FROM events),
          bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
          days AS (SELECT CAST(unnest(generate_series(d0, d1,
                            INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
          tps AS (SELECT DISTINCT event_type FROM e),
          daycnt AS (SELECT event_type, day,
                            CAST(count(1) AS BIGINT) AS cnt
                     FROM e GROUP BY 1, 2),
          cells AS (SELECT t.event_type, d.day, coalesce(c.cnt, 0) AS cnt
                    FROM days d CROSS JOIN tps t
                    LEFT JOIN daycnt c USING (event_type, day)),
          cum AS (SELECT event_type, day,
                         CAST(row_number() OVER w AS BIGINT) AS i,
                         CAST(sum(cnt) OVER w AS BIGINT) AS pre,
                         CAST(count(1) OVER (PARTITION BY event_type)
                              AS BIGINT) AS n,
                         CAST(sum(cnt) OVER (PARTITION BY event_type)
                              AS BIGINT) AS total
                  FROM cells
                  WINDOW w AS (PARTITION BY event_type ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)),
          dv AS (SELECT *, n * pre - i * total AS dev FROM cum
                 WHERE i < n),
          pick AS (SELECT *, row_number() OVER (
                     PARTITION BY event_type
                     ORDER BY abs(dev) DESC, i ASC) AS rn FROM dv)
          SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
                 n AS n_days, total,
                 CAST(dev AS BIGINT) AS dev,
                 round(CAST(pre AS DOUBLE) / i + ${Det.E4}, 4)
                   AS pre_mean,
                 round(CAST(total - pre AS DOUBLE) / (n - i)
                       + ${Det.E4}, 4) AS post_mean
          FROM pick WHERE rn = 1 ORDER BY event_type""",
    // q234: the suffix risk set from the same prefix subtraction; ln
    // arguments are exact rationals; the −1000 sentinel underflows
    // exp to exact 0.0 in both engines.
    "q234_km_survival" ->
      s"""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day
                     FROM events WHERE event_type = 'purchase'),
          mx AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events),
          u AS (SELECT CAST(date_diff('day', min(day), max(day))
                         AS BIGINT) AS t,
                       (date_diff('day', max(day),
                          (SELECT dmax FROM mx)) < 7) AS censored
                FROM e GROUP BY user_id),
          g AS (SELECT t,
                       CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0
                                END) AS BIGINT) AS d,
                       CAST(count(1) AS BIGINT) AS m
                FROM u GROUP BY t),
          tot AS (SELECT CAST(count(1) AS BIGINT) AS ntot FROM u),
          dth AS (SELECT t, d,
                         ntot - CAST(sum(m) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) + m AS n_risk
                  FROM g CROSS JOIN tot),
          s AS (SELECT t, d, n_risk,
                       sum(CASE WHEN n_risk > d
                                THEN ln(CAST(n_risk - d AS DOUBLE)
                                        / CAST(n_risk AS DOUBLE))
                                ELSE -1000.0 END)
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS lnsum
                FROM dth WHERE d > 0)
          SELECT t AS t_days, d AS n_churn, n_risk,
                 round(exp(lnsum) + ${Det.E6}, 6) AS survival
          FROM s ORDER BY t""",
    // q253: q234's construction verbatim through the risk sets; each
    // hazard increment one exact-integer division, summed ascending,
    // exp over the unrounded sum (r6e on both emitted floats)
    "q253_nelson_aalen" ->
      s"""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day
                     FROM events WHERE event_type = 'purchase'),
          mx AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events),
          u AS (SELECT CAST(date_diff('day', min(day), max(day))
                         AS BIGINT) AS t,
                       (date_diff('day', max(day),
                          (SELECT dmax FROM mx)) < 7) AS censored
                FROM e GROUP BY user_id),
          g AS (SELECT t,
                       CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0
                                END) AS BIGINT) AS d,
                       CAST(count(1) AS BIGINT) AS m
                FROM u GROUP BY t),
          tot AS (SELECT CAST(count(1) AS BIGINT) AS ntot FROM u),
          dth AS (SELECT t, d,
                         ntot - CAST(sum(m) OVER (ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) + m AS n_risk
                  FROM g CROSS JOIN tot),
          s AS (SELECT t, d, n_risk,
                       sum(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS h
                FROM dth WHERE d > 0)
          SELECT t AS t_days, d AS n_churn, n_risk,
                 round(h + ${Det.E6}, 6) AS cum_hazard,
                 round(exp(-h) + ${Det.E6}, 6) AS fh_survival
          FROM s ORDER BY t""",
    // q256: exact 2x2 cells in one user-grain fold; OR/CI one float
    // chain with products in DOUBLE; zero cells emit 0.0, never inf
    "q256_odds_ratio" ->
      s"""WITH uu AS (SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1
                            ELSE 0 END) AS BIGINT) AS errs,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END) AS BIGINT) AS purch
                 FROM events GROUP BY user_id),
          m AS (SELECT CAST(count(1) AS BIGINT) AS nu,
                       CAST(sum(errs) AS BIGINT) AS te,
                       CAST(sum(purch) AS BIGINT) AS tp FROM uu),
          u AS (SELECT CASE WHEN CAST(errs AS HUGEINT) * nu
                                 > CAST(te AS HUGEINT) THEN 1
                            ELSE 0 END AS e,
                       CASE WHEN CAST(purch AS HUGEINT) * nu
                                 > CAST(tp AS HUGEINT) THEN 1
                            ELSE 0 END AS o
                FROM uu CROSS JOIN m),
          cells AS (SELECT
              CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
              CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
              CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
              CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd
            FROM u)
          SELECT a, b, c, dd AS d,
                 round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND dd > 0
                       THEN (CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
                            / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
                       ELSE 0.0 END + ${Det.E6}, 6) AS odds_ratio,
                 round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND dd > 0
                       THEN exp(ln((CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
                                   / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
                                - 1.96 * sqrt(1.0 / CAST(a AS DOUBLE)
                                            + 1.0 / CAST(b AS DOUBLE)
                                            + 1.0 / CAST(c AS DOUBLE)
                                            + 1.0 / CAST(dd AS DOUBLE)))
                       ELSE 0.0 END + ${Det.E6}, 6) AS ci_lo,
                 round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND dd > 0
                       THEN exp(ln((CAST(a AS DOUBLE) * CAST(dd AS DOUBLE))
                                   / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
                                + 1.96 * sqrt(1.0 / CAST(a AS DOUBLE)
                                            + 1.0 / CAST(b AS DOUBLE)
                                            + 1.0 / CAST(c AS DOUBLE)
                                            + 1.0 / CAST(dd AS DOUBLE)))
                       ELSE 0.0 END + ${Det.E6}, 6) AS ci_hi
          FROM cells""",
    // q257: ordinal codes from exact integer comparisons over the
    // dense (type, day) grain; entropy one float chain per type (r6e)
    "q257_perm_entropy" ->
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                                CAST(count(1) AS BIGINT) AS c
                         FROM events GROUP BY event_type, CAST(ts AS DATE)),
          lagged AS (SELECT event_type, c,
                            lag(c, 2) OVER (PARTITION BY event_type
                                            ORDER BY day) AS c1,
                            lag(c, 1) OVER (PARTITION BY event_type
                                            ORDER BY day) AS c2
                     FROM daily),
          codes AS (SELECT event_type,
                           CAST(CASE WHEN c2 > c1 THEN 4 ELSE 0 END
                              + CASE WHEN c > c2 THEN 2 ELSE 0 END
                              + CASE WHEN c > c1 THEN 1 ELSE 0 END
                             AS BIGINT) AS code
                    FROM lagged WHERE c1 IS NOT NULL),
          dist AS (SELECT event_type, code,
                          CAST(count(1) AS BIGINT) AS cnt
                   FROM codes GROUP BY event_type, code),
          tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS t,
                         CAST(count(1) AS BIGINT) AS n_patterns
                  FROM dist GROUP BY event_type)
          SELECT d.event_type, t.t AS n_triples, t.n_patterns,
                 round(-sum(CAST(d.cnt AS DOUBLE) / CAST(t.t AS DOUBLE)
                       * ln(CAST(d.cnt AS DOUBLE) / CAST(t.t AS DOUBLE)))
                       + ${Det.E6}, 6) AS perm_entropy
          FROM dist d JOIN tot t USING (event_type)
          GROUP BY d.event_type, t.t, t.n_patterns
          ORDER BY d.event_type""",
    // q258: exact integer pair classification over the bounded
    // (type, day) frame; tau-b one float chain per pair (r6e)
    "q258_kendall_tau" ->
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                                CAST(count(1) AS BIGINT) AS c
                         FROM events GROUP BY 1, 2),
          ser AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         a.day, a.c AS ca, b.c AS cb
                  FROM daily a JOIN daily b
                    ON a.day = b.day AND a.event_type < b.event_type),
          p AS (SELECT x.type_a, x.type_b,
                       CAST(count(1) AS BIGINT) AS n_pairs,
                       CAST(sum(CASE WHEN (y.ca > x.ca AND y.cb > x.cb)
                                       OR (y.ca < x.ca AND y.cb < x.cb)
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
                       CAST(sum(CASE WHEN (y.ca > x.ca AND y.cb < x.cb)
                                       OR (y.ca < x.ca AND y.cb > x.cb)
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
                       CAST(sum(CASE WHEN y.ca = x.ca THEN 1 ELSE 0
                                END) AS BIGINT) AS tx,
                       CAST(sum(CASE WHEN y.cb = x.cb THEN 1 ELSE 0
                                END) AS BIGINT) AS ty
                FROM ser x JOIN ser y
                  ON x.type_a = y.type_a AND x.type_b = y.type_b
                 AND x.day < y.day
                GROUP BY 1, 2)
          SELECT type_a, type_b, n_pairs, n_conc, n_disc,
                 round(CASE WHEN n_pairs > tx AND n_pairs > ty
                       THEN CAST(n_conc - n_disc AS DOUBLE)
                            / sqrt(CAST(n_pairs - tx AS DOUBLE)
                                   * CAST(n_pairs - ty AS DOUBLE))
                       ELSE 0.0 END + ${Det.E6}, 6) AS tau_b
          FROM p ORDER BY type_a, type_b""",
    // q260: combined/within ranks by the declared (value, event_id)
    // tie convention; (r-i)^2 exact, summed in HUGEINT; T one chain
    "q260_cvm_drift" ->
      s"""WITH mn AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
          t AS (SELECT event_type,
                       (date_diff('day', d0, CAST(ts AS DATE)) < 15)
                         AS in_x,
                       value, event_id
                FROM events CROSS JOIN mn),
          rk AS (SELECT event_type, in_x,
                        CAST(row_number() OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS BIGINT) AS r,
                        CAST(row_number() OVER (PARTITION BY event_type,
                          in_x ORDER BY value, event_id) AS BIGINT) AS i
                 FROM t),
          agg AS (SELECT event_type,
                         CAST(sum(CASE WHEN in_x THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_x,
                         CAST(sum(CASE WHEN NOT in_x THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_y,
                         sum(CASE WHEN in_x
                             THEN CAST((r - i) * (r - i) AS HUGEINT)
                             ELSE CAST(0 AS HUGEINT) END) AS sx,
                         sum(CASE WHEN NOT in_x
                             THEN CAST((r - i) * (r - i) AS HUGEINT)
                             ELSE CAST(0 AS HUGEINT) END) AS sy
                  FROM rk GROUP BY 1)
          SELECT event_type, n_x, n_y,
                 round(CAST(CAST(n_x AS HUGEINT) * sx
                            + CAST(n_y AS HUGEINT) * sy AS DOUBLE)
                       / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                          * CAST(n_x + n_y AS DOUBLE))
                       - (4.0 * CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                          - 1.0) / (6.0 * CAST(n_x + n_y AS DOUBLE))
                       + ${Det.E6}, 6) AS cvm_t
          FROM agg ORDER BY event_type""",
    // q262: exact day indices, double slopes, lower median selected
    // by row_number at (k+1) // 2 with the (t1, t2) tiebreak
    "q262_theil_sen" ->
      s"""WITH mn AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
          daily AS (SELECT event_type,
                           CAST(date_diff('day', d0, CAST(ts AS DATE))
                                AS BIGINT) AS t,
                           CAST(count(1) AS BIGINT) AS c
                    FROM events CROSS JOIN mn GROUP BY 1, 2),
          slopes AS (SELECT x.event_type, x.t AS t1, y.t AS t2,
                            CAST(y.c - x.c AS DOUBLE)
                              / CAST(y.t - x.t AS DOUBLE) AS slope
                     FROM daily x JOIN daily y
                       ON x.event_type = y.event_type AND x.t < y.t),
          k AS (SELECT event_type, CAST(count(1) AS BIGINT) AS n_pairs
                FROM slopes GROUP BY 1),
          r AS (SELECT event_type, slope,
                       CAST(row_number() OVER (PARTITION BY event_type
                         ORDER BY slope, t1, t2) AS BIGINT) AS rn
                FROM slopes)
          SELECT r.event_type, k.n_pairs,
                 round(r.slope + ${Det.E6}, 6) AS sen_slope
          FROM r JOIN k USING (event_type)
          WHERE r.rn = (k.n_pairs + 1) // 2
          ORDER BY r.event_type""",
    // q264: dense day spine; exact prefix longs; the m-chain a
    // sequential double fold in day order (q31 precedent); argmax
    // ties earliest-first
    "q264_page_hinkley" ->
      s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day
                      FROM events),
          b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
          days AS (SELECT CAST(unnest(generate_series(d0, d1,
                            INTERVAL 1 DAY)) AS DATE) AS day FROM b),
          tps AS (SELECT DISTINCT event_type FROM ev),
          dc AS (SELECT event_type, day, CAST(count(1) AS BIGINT) AS cnt
                 FROM ev GROUP BY 1, 2),
          cells AS (SELECT t.event_type, d.day,
                           CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
                    FROM days d CROSS JOIN tps t
                    LEFT JOIN dc c USING (event_type, day)),
          seq AS (SELECT event_type, day, cnt,
                         CAST(row_number() OVER w AS BIGINT) AS i,
                         CAST(sum(cnt) OVER (PARTITION BY event_type
                           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS pre
                  FROM cells
                  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
          m AS (SELECT event_type, day, i, cnt,
                       sum(CAST(cnt AS DOUBLE)
                           - CAST(pre AS DOUBLE) / CAST(i AS DOUBLE))
                         OVER (PARTITION BY event_type ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING AND
                               CURRENT ROW) AS mm
                FROM seq),
          ph AS (SELECT event_type, day, i, cnt,
                        mm - min(mm) OVER (PARTITION BY event_type
                          ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS ph
                 FROM m),
          pick AS (SELECT event_type, day, ph,
                          row_number() OVER (PARTITION BY event_type
                            ORDER BY ph DESC, i ASC) AS rk
                   FROM ph),
          tot AS (SELECT event_type,
                         CAST(count(1) AS BIGINT) AS n_days,
                         CAST(sum(cnt) AS BIGINT) AS total
                  FROM cells GROUP BY 1)
          SELECT t.event_type, t.n_days, t.total,
                 strftime(p.day, '%Y-%m-%d') AS ph_day,
                 round(p.ph + ${Det.E6}, 6) AS ph_max
          FROM tot t JOIN pick p USING (event_type)
          WHERE p.rk = 1 ORDER BY t.event_type""",
    // q266: dense spine; dow 0..6 Sunday-first both engines; exact
    // sums (ss2 in HUGEINT), eta2/peak one float chain over <=7 rows
    "q266_dow_eta2" ->
      s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day
                      FROM events),
          b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
          days AS (SELECT CAST(unnest(generate_series(d0, d1,
                            INTERVAL 1 DAY)) AS DATE) AS day FROM b),
          tps AS (SELECT DISTINCT event_type FROM ev),
          dc AS (SELECT event_type, day, CAST(count(1) AS BIGINT) AS cnt
                 FROM ev GROUP BY 1, 2),
          cells AS (SELECT t.event_type, d.day,
                           CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
                           CAST(date_part('dow', d.day) AS BIGINT) AS dow
                    FROM days d CROSS JOIN tps t
                    LEFT JOIN dc c USING (event_type, day)),
          g AS (SELECT event_type, dow,
                       CAST(count(1) AS BIGINT) AS ng,
                       CAST(sum(cnt) AS BIGINT) AS sg
                FROM cells GROUP BY 1, 2),
          tot AS (SELECT event_type, CAST(count(1) AS BIGINT) AS n,
                         CAST(sum(cnt) AS BIGINT) AS st,
                         sum(CAST(cnt AS HUGEINT) * cnt) AS ss2
                  FROM cells GROUP BY 1),
          ssb AS (SELECT event_type,
                         sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                             / CAST(ng AS DOUBLE)) AS ssb_num
                  FROM g GROUP BY 1),
          pk AS (SELECT event_type, dow,
                        CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS mean,
                        row_number() OVER (PARTITION BY event_type
                          ORDER BY CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                            DESC, dow ASC) AS rk
                 FROM g)
          SELECT t.event_type, t.n AS n_days, t.st AS total,
                 round(CASE WHEN CAST(t.ss2 AS DOUBLE)
                                 - CAST(t.st AS DOUBLE)
                                   * CAST(t.st AS DOUBLE)
                                   / CAST(t.n AS DOUBLE) > 0.0
                       THEN (s.ssb_num - CAST(t.st AS DOUBLE)
                             * CAST(t.st AS DOUBLE) / CAST(t.n AS DOUBLE))
                            / (CAST(t.ss2 AS DOUBLE)
                               - CAST(t.st AS DOUBLE)
                                 * CAST(t.st AS DOUBLE)
                                 / CAST(t.n AS DOUBLE))
                       ELSE 0.0 END + ${Det.E6}, 6) AS eta2,
                 p.dow AS peak_dow,
                 round(p.mean + ${Det.E6}, 6) AS peak_mean
          FROM tot t JOIN ssb s USING (event_type)
          JOIN pk p ON p.event_type = t.event_type AND p.rk = 1
          ORDER BY t.event_type""",
    // q267: q132's transition build verbatim; exact counts; the two
    // floats one chain each; absorbing state emits dwell 0.0
    "q267_state_dwell" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
                            date_trunc('second', ts) AS tsec FROM events),
          t AS (SELECT event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY tsec, event_id) AS dst
                FROM e),
          c AS (SELECT src, dst, CAST(count(1) AS BIGINT) AS cnt
                FROM t WHERE dst IS NOT NULL GROUP BY src, dst),
          rs AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS r
                 FROM c GROUP BY src),
          sf AS (SELECT src, cnt AS c_self FROM c WHERE src = dst),
          tp AS (SELECT src, dst AS top_dst, cnt AS top_cnt,
                        row_number() OVER (PARTITION BY src
                          ORDER BY cnt DESC, dst ASC) AS rk
                 FROM c WHERE src <> dst)
          SELECT rs.src, rs.r AS n_out,
                 CAST(coalesce(sf.c_self, 0) AS BIGINT) AS n_self,
                 round(CAST(coalesce(sf.c_self, 0) AS DOUBLE)
                       / CAST(rs.r AS DOUBLE) + ${Det.E6}, 6) AS p_self,
                 round(CASE WHEN rs.r > coalesce(sf.c_self, 0)
                       THEN CAST(rs.r AS DOUBLE)
                            / CAST(rs.r - coalesce(sf.c_self, 0)
                                   AS DOUBLE)
                       ELSE 0.0 END + ${Det.E6}, 6) AS expected_dwell,
                 coalesce(tp.top_dst, '') AS top_dst,
                 CAST(coalesce(tp.top_cnt, 0) AS BIGINT) AS top_cnt
          FROM rs LEFT JOIN sf USING (src)
          LEFT JOIN tp ON tp.src = rs.src AND tp.rk = 1
          ORDER BY rs.src""",
    // q268: exact (type, hr)/global counts; JSD the two-KL form with
    // p>0 / q>0 zero-cell guards; peak hour ties lowest-first
    "q268_hour_shape_jsd" ->
      s"""WITH cells AS (SELECT event_type,
                                CAST(date_part('hour', ts) AS BIGINT)
                                  AS hr,
                                CAST(count(1) AS BIGINT) AS c
                         FROM events GROUP BY 1, 2),
          gh AS (SELECT hr, CAST(sum(c) AS BIGINT) AS g
                   FROM cells GROUP BY 1),
          nt AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
                 FROM cells GROUP BY 1),
          ng AS (SELECT CAST(sum(c) AS BIGINT) AS ntot FROM cells),
          frame AS (SELECT nt.event_type, gh.hr, nt.n, gh.g,
                           CAST(coalesce(cells.c, 0) AS BIGINT) AS c
                    FROM nt CROSS JOIN gh
                    LEFT JOIN cells ON cells.event_type = nt.event_type
                                   AND cells.hr = gh.hr),
          jsd AS (SELECT event_type,
                         sum(CASE WHEN c > 0 THEN
                               (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                               * ln((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                                 / ((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                                     + CAST(g AS DOUBLE)
                                       / CAST(ntot AS DOUBLE)) / 2.0))
                             ELSE 0.0 END) / 2.0
                         + sum(CASE WHEN g > 0 THEN
                               (CAST(g AS DOUBLE) / CAST(ntot AS DOUBLE))
                               * ln((CAST(g AS DOUBLE)
                                     / CAST(ntot AS DOUBLE))
                                 / ((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                                     + CAST(g AS DOUBLE)
                                       / CAST(ntot AS DOUBLE)) / 2.0))
                             ELSE 0.0 END) / 2.0 AS jsd
                  FROM frame CROSS JOIN ng GROUP BY event_type),
          pk AS (SELECT event_type, hr,
                        row_number() OVER (PARTITION BY event_type
                          ORDER BY c DESC, hr ASC) AS rk
                 FROM cells)
          SELECT nt.event_type, nt.n AS n_events, pk.hr AS peak_hr,
                 round(jsd.jsd + ${Det.E6}, 6) AS jsd
          FROM nt JOIN jsd USING (event_type)
          JOIN pk ON pk.event_type = nt.event_type AND pk.rk = 1
          ORDER BY nt.event_type""",
    // q269: q125's cohort build; DENSE offset spine (a missing
    // offset IS a zero-retention day); exact 2*retained < n compare
    "q269_retention_half_life" ->
      s"""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day
                      FROM events),
          mx AS (SELECT max(day) AS d1 FROM ev),
          f AS (SELECT user_id, min(day) AS cohort_day
                FROM ev GROUP BY user_id),
          sz AS (SELECT cohort_day, CAST(count(1) AS BIGINT) AS n_users
                 FROM f GROUP BY 1),
          act AS (SELECT f.cohort_day,
                         CAST(date_diff('day', f.cohort_day, a.day)
                              AS BIGINT) AS k,
                         CAST(count(1) AS BIGINT) AS retained
                  FROM (SELECT DISTINCT user_id, day FROM ev) a
                  JOIN f USING (user_id)
                  WHERE a.day > f.cohort_day
                  GROUP BY 1, 2),
          spine AS (SELECT s.cohort_day, s.n_users,
                           CAST(unnest(range(1,
                             CAST(date_diff('day', s.cohort_day,
                               (SELECT d1 FROM mx)) AS BIGINT) + 1))
                             AS BIGINT) AS k
                    FROM sz s
                    WHERE date_diff('day', s.cohort_day,
                            (SELECT d1 FROM mx)) >= 1),
          below AS (SELECT sp.cohort_day,
                           min(sp.k) AS kk
                    FROM spine sp LEFT JOIN act
                      ON act.cohort_day = sp.cohort_day
                     AND act.k = sp.k
                    WHERE coalesce(act.retained, 0) * 2 < sp.n_users
                    GROUP BY 1),
          hl AS (SELECT b.cohort_day, b.kk,
                        CAST(coalesce(act.retained, 0) AS BIGINT) AS r
                 FROM below b LEFT JOIN act
                   ON act.cohort_day = b.cohort_day AND act.k = b.kk)
          SELECT strftime(sz.cohort_day, '%Y-%m-%d') AS cohort_day,
                 sz.n_users,
                 CAST(coalesce(hl.kk, -1) AS BIGINT) AS half_life,
                 CAST(coalesce(hl.r, 0) AS BIGINT) AS retained_at_hl
          FROM sz LEFT JOIN hl USING (cohort_day)
          ORDER BY cohort_day""",
    // q270: exact distinct (user, day); day+1 self-join for the
    // common count; Jaccard/carryover one float chain each
    "q270_user_turnover" ->
      s"""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                      FROM events),
          pd AS (SELECT day, CAST(count(1) AS BIGINT) AS n_active
                 FROM ud GROUP BY 1),
          cm AS (SELECT a.day, CAST(count(1) AS BIGINT) AS n_common
                 FROM ud a JOIN ud b
                   ON b.user_id = a.user_id
                  AND b.day = a.day + 1
                 GROUP BY 1),
          nx AS (SELECT day - 1 AS day,
                        n_active AS n_next FROM pd)
          SELECT strftime(pd.day, '%Y-%m-%d') AS day,
                 pd.n_active, nx.n_next,
                 CAST(coalesce(cm.n_common, 0) AS BIGINT) AS n_common,
                 round(CAST(coalesce(cm.n_common, 0) AS DOUBLE)
                       / CAST(pd.n_active + nx.n_next
                              - coalesce(cm.n_common, 0) AS DOUBLE)
                       + ${Det.E6}, 6) AS jaccard,
                 round(CAST(coalesce(cm.n_common, 0) AS DOUBLE)
                       / CAST(pd.n_active AS DOUBLE)
                       + ${Det.E6}, 6) AS carryover
          FROM pd JOIN nx USING (day) LEFT JOIN cm USING (day)
          ORDER BY pd.day""",
    // q263: lower-median reference, tie days dropped, runs via one
    // lag; R/n1/n2 exact longs, z one float chain (r6e)
    "q263_runs_test" ->
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                                CAST(count(1) AS BIGINT) AS c
                         FROM events GROUP BY 1, 2),
          nd AS (SELECT event_type, CAST(count(1) AS BIGINT) AS n_days
                 FROM daily GROUP BY 1),
          med AS (SELECT d.event_type, d.c AS med
                  FROM (SELECT event_type, c,
                               CAST(row_number() OVER (PARTITION BY
                                 event_type ORDER BY c, day) AS BIGINT)
                                 AS rn
                        FROM daily) d JOIN nd USING (event_type)
                  WHERE d.rn = (nd.n_days + 1) // 2),
          s AS (SELECT d.event_type, d.day, (d.c > m.med) AS up
                FROM daily d JOIN med m USING (event_type)
                WHERE d.c <> m.med),
          l AS (SELECT event_type, up,
                       lag(up, 1) OVER (PARTITION BY event_type
                                        ORDER BY day) AS prev
                FROM s),
          agg AS (SELECT event_type,
                         CAST(sum(CASE WHEN prev IS NULL OR prev <> up
                                  THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_runs,
                         CAST(sum(CASE WHEN up THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_above,
                         CAST(sum(CASE WHEN NOT up THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_below
                  FROM l GROUP BY 1)
          SELECT event_type, n_runs, n_above, n_below,
                 round(CASE WHEN n_above > 0 AND n_below > 0
                                 AND n_above + n_below > 1
                                 AND 2.0 * n_above * n_below
                                     * (2.0 * CAST(n_above AS DOUBLE)
                                        * n_below - n_above - n_below)
                                     > 0.0
                       THEN (CAST(n_runs AS DOUBLE)
                             - (1.0 + 2.0 * CAST(n_above AS DOUBLE)
                                * CAST(n_below AS DOUBLE)
                                / CAST(n_above + n_below AS DOUBLE)))
                            / sqrt(2.0 * CAST(n_above AS DOUBLE)
                                   * CAST(n_below AS DOUBLE)
                                   * (2.0 * CAST(n_above AS DOUBLE)
                                      * CAST(n_below AS DOUBLE)
                                      - CAST(n_above + n_below
                                             AS DOUBLE))
                                   / (CAST(n_above + n_below AS DOUBLE)
                                      * CAST(n_above + n_below
                                             AS DOUBLE)
                                      * (CAST(n_above + n_below
                                              AS DOUBLE) - 1.0)))
                       ELSE 0.0 END + ${Det.E6}, 6) AS z
          FROM agg ORDER BY event_type""",
    // q237: the q234 construction per cohort; O1 exact; E1/V float
    // sums of exact-rational terms over the bounded frame (r6e).
    "q237_logrank" ->
      s"""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day
                     FROM events WHERE event_type = 'purchase'),
          mx AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events),
          u AS (SELECT CAST(date_diff('day', min(day), max(day))
                         AS BIGINT) AS t,
                       (date_diff('day', max(day),
                          (SELECT dmax FROM mx)) < 7) AS censored,
                       CAST(user_id % 2 AS INT) AS g
                FROM e GROUP BY user_id),
          gr AS (SELECT t,
                        CAST(sum(CASE WHEN NOT censored THEN 1 ELSE 0
                                 END) AS BIGINT) AS d,
                        CAST(count(1) AS BIGINT) AS m,
                        CAST(sum(CASE WHEN NOT censored AND g = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                        CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)
                             AS BIGINT) AS m1
                 FROM u GROUP BY t),
          tot AS (SELECT CAST(count(1) AS BIGINT) AS ntot,
                         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n1tot
                  FROM u),
          dth AS (SELECT t, d, d1, ntot, n1tot,
                         ntot - CAST(sum(m) OVER w AS BIGINT) + m AS n,
                         n1tot - CAST(sum(m1) OVER w AS BIGINT) + m1
                           AS n1
                  FROM gr CROSS JOIN tot
                  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW)),
          dd AS (SELECT * FROM dth WHERE d > 0),
          a AS (SELECT coalesce(CAST(sum(d) AS BIGINT), 0) AS deaths,
                       coalesce(CAST(sum(d1) AS BIGINT), 0) AS o1,
                       coalesce(sum((CAST(d AS DOUBLE)
                             * CAST(n1 AS DOUBLE))
                           / CAST(n AS DOUBLE)), 0.0) AS e1,
                       coalesce(sum(CASE WHEN n > 1 THEN
                             ((CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE))
                              / CAST(n AS DOUBLE)
                              * (1.0 - CAST(n1 AS DOUBLE)
                                       / CAST(n AS DOUBLE)))
                             * ((CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
                                / (CAST(n AS DOUBLE) - 1.0))
                           ELSE 0.0 END), 0.0) AS v
                FROM dd),
          af AS (SELECT t.ntot AS n_users, t.n1tot AS n_g1,
                        a.deaths, a.o1, a.e1, a.v
                 FROM a CROSS JOIN tot t)
          SELECT n_users, n_g1, deaths, o1,
                 round(e1 + ${Det.E6}, 6) AS e1,
                 round(v + ${Det.E6}, 6) AS v,
                 round(CASE WHEN v > 0.0 THEN
                         (CAST(o1 AS DOUBLE) - e1)
                         * (CAST(o1 AS DOUBLE) - e1) / v
                       ELSE 0.0 END + ${Det.E6}, 6) AS chi2
          FROM af""",
    // q235: one conditional-sum moments pass; decimal products in
    // HUGEINT; every display float mirrors the Spark op order.
    "q235_cuped" ->
      s"""WITH e AS (SELECT user_id,
                            (CAST(ts AS DATE) < DATE '2024-01-16')
                              AS pre,
                            CASE WHEN event_type = 'purchase'
                                 THEN CAST(round(value * 100) AS BIGINT)
                                 ELSE 0 END AS cents
                     FROM events),
          u AS (SELECT user_id,
                       CAST(sum(CASE WHEN pre THEN cents ELSE 0 END)
                            AS BIGINT) AS x,
                       CAST(sum(CASE WHEN NOT pre THEN cents ELSE 0 END)
                            AS BIGINT) AS y,
                       CAST(user_id % 2 AS INT) AS v
                FROM e GROUP BY user_id),
          m AS (SELECT CAST(count(1) AS BIGINT) AS n,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       sum(CAST(x AS HUGEINT) * x) AS sxx,
                       sum(CAST(x AS HUGEINT) * y) AS sxy,
                       sum(CAST(y AS HUGEINT) * y) AS syy,
                       CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n1,
                       CAST(sum(CASE WHEN v = 1 THEN x ELSE 0 END)
                            AS BIGINT) AS sx1,
                       CAST(sum(CASE WHEN v = 1 THEN y ELSE 0 END)
                            AS BIGINT) AS sy1,
                       CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n0,
                       CAST(sum(CASE WHEN v = 0 THEN x ELSE 0 END)
                            AS BIGINT) AS sx0,
                       CAST(sum(CASE WHEN v = 0 THEN y ELSE 0 END)
                            AS BIGINT) AS sy0
                FROM u)
          SELECT n AS n_users, n1, n0,
                 round(CAST(CAST(n AS HUGEINT) * sxy
                              - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                       / CAST(CAST(n AS HUGEINT) * sxx
                              - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                       + ${Det.E6}, 6) AS theta,
                 round((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                       / 100.0 + ${Det.E4}, 4) AS raw_lift,
                 round((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                       / 100.0
                       - (CAST(CAST(n AS HUGEINT) * sxy
                                - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                          / CAST(CAST(n AS HUGEINT) * sxx
                                - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                         * ((CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                             - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                            / 100.0)
                       + ${Det.E4}, 4) AS adj_lift,
                 round((CAST(CAST(n AS HUGEINT) * sxy
                               - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                        * CAST(CAST(n AS HUGEINT) * sxy
                               - CAST(sx AS HUGEINT) * sy AS DOUBLE))
                       / (CAST(CAST(n AS HUGEINT) * sxx
                               - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                          * CAST(CAST(n AS HUGEINT) * syy
                               - CAST(sy AS HUGEINT) * sy AS DOUBLE))
                       + ${Det.E6}, 6) AS var_reduction
          FROM m""",
    // q236: the dense q226 spine; the pairwise S on an exact sign
    // sum; tie-corrected variance numerator exact BIGINT.
    "q236_mann_kendall" ->
      s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day
                     FROM events),
          bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
          days AS (SELECT CAST(unnest(generate_series(d0, d1,
                            INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
          tps AS (SELECT DISTINCT event_type FROM e),
          daycnt AS (SELECT event_type, day,
                            CAST(count(1) AS BIGINT) AS cnt
                     FROM e GROUP BY 1, 2),
          cells AS (SELECT t.event_type, d.day, coalesce(c.cnt, 0) AS cnt
                    FROM days d CROSS JOIN tps t
                    LEFT JOIN daycnt c USING (event_type, day)),
          sst AS (SELECT a.event_type,
                         CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
                                       WHEN b.cnt < a.cnt THEN -1
                                       ELSE 0 END) AS BIGINT) AS s_stat
                  FROM cells a JOIN cells b
                    ON a.event_type = b.event_type AND a.day < b.day
                  GROUP BY a.event_type),
          tie AS (SELECT event_type,
                         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                           AS tsum,
                         CAST(sum(t) AS BIGINT) AS n
                  FROM (SELECT event_type, cnt,
                               CAST(count(1) AS BIGINT) AS t
                        FROM cells GROUP BY 1, 2)
                  GROUP BY event_type)
          SELECT s.event_type, t.n AS n_days, s.s_stat,
                 t.n * (t.n - 1) * (2 * t.n + 5) - t.tsum AS var_num,
                 round(CASE
                   WHEN t.n * (t.n - 1) * (2 * t.n + 5) - t.tsum = 0
                     THEN 0.0
                   WHEN s.s_stat > 0 THEN
                     (CAST(s.s_stat AS DOUBLE) - 1.0)
                     / sqrt(CAST(t.n * (t.n - 1) * (2 * t.n + 5)
                                 - t.tsum AS DOUBLE) / 18.0)
                   WHEN s.s_stat < 0 THEN
                     (CAST(s.s_stat AS DOUBLE) + 1.0)
                     / sqrt(CAST(t.n * (t.n - 1) * (2 * t.n + 5)
                                 - t.tsum AS DOUBLE) / 18.0)
                   ELSE 0.0 END + ${Det.E6}, 6) AS z
          FROM sst s JOIN tie t USING (event_type)
          ORDER BY s.event_type""",
    // q215: q144's session arithmetic; token-terminated chain string;
    // occurrences by the replace-shrink identity (greedy
    // non-overlapping, identical in both engines).
    "q215_seq_pattern" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
                            CAST(floor(epoch(date_trunc('second', ts)))
                                 AS BIGINT) AS tsec
                     FROM events),
          b AS (SELECT *, CASE WHEN tsec - lag(tsec) OVER (
                            PARTITION BY user_id
                            ORDER BY tsec ASC, event_id ASC) > 1800
                          THEN 1 ELSE 0 END AS brk
                FROM e),
          sesh AS (SELECT *, sum(brk) OVER (
                     PARTITION BY user_id ORDER BY tsec ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS sess
                   FROM b),
          sq AS (SELECT user_id,
                        string_agg(event_type || '>', ''
                          ORDER BY tsec ASC, event_id ASC) AS seq
                 FROM sesh GROUP BY user_id, sess),
          pt AS (SELECT unnest(['view>click>purchase>', 'error>error>',
                                'signup>purchase>']) AS pattern),
          oc AS (SELECT user_id, pattern,
                        CAST((len(seq) - len(replace(seq, pattern, '')))
                             // len(pattern) AS BIGINT) AS occ
                 FROM sq, pt)
          SELECT pattern, CAST(sum(occ) AS BIGINT) AS n_occ,
                 CAST(sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sessions,
                 CAST(count(DISTINCT CASE WHEN occ > 0 THEN user_id END)
                      AS BIGINT) AS n_users
          FROM oc GROUP BY 1 ORDER BY 1""",
    // q216: q116's strict-order anchor CTEs, then per-transition
    // latency stats; quantile_cont matches the engine's exact median.
    "q216_funnel_latency" ->
      s"""WITH e AS (SELECT user_id, event_type,
                            date_trunc('second', ts) AS t FROM events),
          v AS (SELECT user_id, min(t) AS tv FROM e
                WHERE event_type = 'view' GROUP BY user_id),
          c AS (SELECT e.user_id, min(e.t) AS tc
                FROM e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.t > v.tv
                GROUP BY e.user_id),
          p AS (SELECT e.user_id, min(e.t) AS tp
                FROM e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.t > c.tc
                GROUP BY e.user_id),
          f AS (SELECT v.user_id, v.tv, c.tc, p.tp
                FROM v LEFT JOIN c USING (user_id)
                       LEFT JOIN p USING (user_id)),
          d AS (SELECT 'view->click' AS transition,
                       1 AS reached,
                       CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS conv,
                       CAST(floor(epoch(tc)) AS BIGINT)
                         - CAST(floor(epoch(tv)) AS BIGINT) AS lat_s
                FROM f
                UNION ALL
                SELECT 'click->purchase',
                       CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END,
                       CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END,
                       CAST(floor(epoch(tp)) AS BIGINT)
                         - CAST(floor(epoch(tc)) AS BIGINT)
                FROM f)
          SELECT transition, CAST(sum(reached) AS BIGINT) AS n_reached,
                 CAST(sum(conv) AS BIGINT) AS n_converted,
                 round(CAST(sum(conv) AS DOUBLE) / sum(reached)
                       + ${Det.E4}, 4) AS conv_rate,
                 round(avg(lat_s) + ${Det.E4}, 4) AS avg_s,
                 round(quantile_cont(CAST(lat_s AS DOUBLE), 0.5)
                       + ${Det.E4}, 4) AS p50_s,
                 max(lat_s) AS max_s
          FROM d GROUP BY transition ORDER BY transition""",
    "q206_mad_outliers" ->
      s"""WITH base AS (SELECT event_type, value FROM events),
          med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                  FROM base GROUP BY event_type),
          dev AS (SELECT b.event_type, m.med, abs(b.value - m.med) AS dev
                  FROM base b JOIN med m USING (event_type)),
          mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
                  FROM dev GROUP BY event_type)
          SELECT d.event_type, CAST(count(1) AS BIGINT) AS n,
                 round(max(d.med) + ${Det.E4}, 4) AS med,
                 round(max(a.mad) + ${Det.E4}, 4) AS mad,
                 CAST(sum(CASE WHEN d.dev > 4.4478 * a.mad
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
                 round(sum(CASE WHEN d.dev > 4.4478 * a.mad
                               THEN 1 ELSE 0 END)
                       / CAST(count(1) AS DOUBLE) + ${Det.E4}, 4)
                   AS out_rate
          FROM dev d JOIN mad a USING (event_type)
          GROUP BY d.event_type ORDER BY d.event_type""",
    "q144_session_cooccurrence" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
                            date_trunc('second', ts) AS tsec FROM events),
          g AS (SELECT *,
                       CASE WHEN date_diff('second',
                              lag(tsec) OVER (PARTITION BY user_id
                                ORDER BY tsec, event_id), tsec) > 1800
                            THEN 1 ELSE 0 END AS brk
                FROM e),
          l AS (SELECT user_id, event_type,
                       1 + sum(brk) OVER (PARTITION BY user_id
                         ORDER BY tsec, event_id
                         ROWS UNBOUNDED PRECEDING) AS sess
                FROM g),
          dt AS (SELECT DISTINCT user_id, sess, event_type FROM l),
          n AS (SELECT CAST(count(1) AS DOUBLE) AS ns
                FROM (SELECT DISTINCT user_id, sess FROM dt)),
          tc AS (SELECT event_type AS t, CAST(count(1) AS BIGINT) AS ct
                 FROM dt GROUP BY event_type),
          pc AS (SELECT a.event_type AS ta, b.event_type AS tb,
                        CAST(count(1) AS BIGINT) AS n_both
                 FROM dt a JOIN dt b
                   ON a.user_id = b.user_id AND a.sess = b.sess
                  AND a.event_type < b.event_type
                 GROUP BY 1, 2)
          SELECT pc.ta, pc.tb, pc.n_both,
                 round((pc.n_both / n.ns) /
                       ((ca.ct / n.ns) * (cb.ct / n.ns)) + ${Det.E4}, 4)
                   AS lift
          FROM pc JOIN tc ca ON ca.t = pc.ta
                  JOIN tc cb ON cb.t = pc.tb, n
          ORDER BY ta, tb""",
    "q150_mg_heavy_hitters" ->
      """SELECT user_id, CAST(count(1) AS BIGINT) AS n
         FROM events GROUP BY user_id
         ORDER BY n DESC, user_id ASC LIMIT 50""",
    "q145_partition_prune" ->
      """SELECT event_type, CAST(count(1) AS BIGINT) AS n,
                round(sum(value), 2) AS sv
         FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
         GROUP BY 1 ORDER BY 1""",
    "q141_rolling_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                     FROM events),
         days AS (SELECT DISTINCT day FROM ud)
         SELECT strftime(d.day, '%Y-%m-%d') AS day,
                CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
         FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
         GROUP BY d.day ORDER BY day""",
    "q139_week_retention" ->
      s"""WITH uw AS (SELECT DISTINCT date_trunc('week', ts) AS wk, user_id
                      FROM events),
          pw AS (SELECT wk, CAST(count(1) AS BIGINT) AS n_active
                 FROM uw GROUP BY wk),
          r AS (SELECT cur.wk, CAST(count(1) AS BIGINT) AS n_retained
                FROM uw prv JOIN uw cur
                  ON prv.user_id = cur.user_id
                 AND cur.wk = prv.wk + INTERVAL 7 DAY
                GROUP BY cur.wk)
          SELECT strftime(pw.wk, '%Y-%m-%d') AS week,
                 pp.n_active AS n_prev, pw.n_active, r.n_retained,
                 round(r.n_retained / CAST(pp.n_active AS DOUBLE)
                       + ${Det.E4}, 4) AS retention
          FROM pw
          JOIN r ON r.wk = pw.wk
          JOIN pw pp ON pp.wk + INTERVAL 7 DAY = pw.wk
          ORDER BY week""",
    "q140_user_features" ->
      """SELECT user_id, CAST(count(1) AS BIGINT) AS n_events,
                CAST(count(1) FILTER (event_type = 'view') AS BIGINT) AS n_view,
                CAST(count(1) FILTER (event_type = 'click') AS BIGINT) AS n_click,
                CAST(count(1) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
                CAST(count(1) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
                CAST(count(1) FILTER (event_type = 'error') AS BIGINT) AS n_error,
                round(sum(value), 2) AS total_value,
                CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
                epoch_ms(date_trunc('second', max(ts))) // 1000 AS last_seen_s
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q137_cumulative_users" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
                    FROM events GROUP BY user_id),
         nd AS (SELECT day, CAST(count(1) AS BIGINT) AS new_users
                FROM f GROUP BY day)
         SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
                CAST(sum(new_users) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
         FROM nd ORDER BY day""",
    "q129_gapfill_ffill" ->
      """WITH hr AS (SELECT event_type, date_trunc('hour', ts) AS h,
                            CAST(count(1) AS BIGINT) AS n,
                            round(sum(value), 2) AS rev
                     FROM events GROUP BY 1, 2),
         b AS (SELECT event_type, min(h) AS h0, max(h) AS h1
               FROM hr GROUP BY 1),
         sp AS (SELECT event_type,
                       unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                FROM b),
         j AS (SELECT sp.event_type, sp.h, hr.n, hr.rev
               FROM sp LEFT JOIN hr
                 ON hr.event_type = sp.event_type AND hr.h = sp.h)
         SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hr,
                CAST(coalesce(n, 0) AS BIGINT) AS n_filled,
                last_value(rev IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY h
                  ROWS UNBOUNDED PRECEDING) AS rev_ff,
                CAST(n IS NULL AS INT) AS is_gap
         FROM j ORDER BY event_type, hr""",
    "q132_markov_transitions" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
                            date_trunc('second', ts) AS tsec FROM events),
          t AS (SELECT event_type AS src,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY tsec, event_id) AS dst
                FROM e),
          c AS (SELECT src, dst, CAST(count(1) AS BIGINT) AS cnt
                FROM t WHERE dst IS NOT NULL GROUP BY src, dst),
          tt AS (SELECT src, CAST(sum(cnt) AS DOUBLE) AS tot
                 FROM c GROUP BY src)
          SELECT c.src, c.dst, c.cnt,
                 round(c.cnt / tt.tot + ${Det.E4}, 4) AS p
          FROM c JOIN tt USING (src) ORDER BY src, dst""",
    "q116_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
                           date_trunc('second', ts) AS t FROM events),
         v AS (SELECT user_id, min(t) AS tv FROM e
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.t) AS tc
               FROM e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.t > v.tv
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.t) AS tp
               FROM e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.t > c.tc
               GROUP BY e.user_id)
         SELECT v.user_id,
                epoch_ms(v.tv) // 1000 AS view_s,
                epoch_ms(c.tc) // 1000 AS click_s,
                epoch_ms(p.tp) // 1000 AS purchase_s,
                CAST(p.tp IS NOT NULL AS INT) AS converted
         FROM v LEFT JOIN c ON v.user_id = c.user_id
                LEFT JOIN p ON v.user_id = p.user_id
         ORDER BY v.user_id""")
}
