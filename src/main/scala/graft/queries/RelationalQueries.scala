package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational core: scans, filters, projections, joins, aggregations
  * (SURVEY.md §2.1–§2.4). The reference's query layer is Synapse
  * serverless T-SQL over lake files (`/root/reference/README.md:173-192`);
  * each operator here is the Spark-native equivalent, declared with the
  * DataFrame API so Catalyst handles pushdown, pruning, join selection
  * and partial aggregation (SURVEY.md §4).
  *
  * Determinism contract (SURVEY.md §2.0): every query ends in a
  * total-order sort, floats are rounded, counts cast to bigint on the
  * DuckDB side, null ordering is explicit on both sides.
  *
  * Scale notes are per-query; the common ones:
  *  - filters/projections sit directly on the parquet scan → pushed
  *    down (verified via .explain PushedFilters/ReadSchema);
  *  - joins against `region`/`nation`/small dims are broadcast;
  *  - all aggregations are partial+final hash aggregates (map-side
  *    combine), no driver-side collection anywhere.
  */
object RelationalQueries {

  // ---- §2.1 scans -------------------------------------------------------

  /** q01: full scan + column projection. At 100 TB this is a pure
    * columnar read of 4/11 lineitem columns (ReadSchema pruning). */
  private def q01(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .withColumn("l_extendedprice", round(col("l_extendedprice"), 2))
      .transform(Det.emitWide(_, "l_orderkey", "l_linenumber"))

  /** q02: scan with filter + projection pushed into the parquet reader
    * (row-group/page skipping via min-max stats; ref: the day-glob
    * pruning at README.md:182). */
  private def q02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_shipdate") >= lit("1999-01-01") && col("l_quantity") < 10)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").cast("string").as("ship_d"),
        round(col("l_extendedprice"), 2).as("price"))
      .transform(Det.emitWide(_, "l_orderkey", "l_linenumber"))

  // ---- §2.2 filter / project / cast ------------------------------------

  /** q03: compound predicates — AND/OR/NOT, IN, BETWEEN, LIKE, IS NOT NULL. */
  private def q03(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .where(
        col("p_size").between(10, 40) &&
        (col("p_type").like("%O%") ||
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")) &&
        !(col("p_retailprice") < 905.0) &&
        col("p_name").isNotNull)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        round(col("p_retailprice"), 2).as("price"))
      .transform(Det.emitWide(_, "p_partkey"))

  /** q04: projection with CASE WHEN / COALESCE / NULLIF / GREATEST / LEAST. */
  private def q04(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("pos_bal"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("capped"))
      .transform(Det.emitWide(_, "c_custkey"))

  /** q05: explicit casts across string/int/double/date. Mirrors the
    * reference's CAST(JSON_VALUE(...) AS float) (README.md:179).
    * floor() before the int cast: Spark truncates double→int while
    * DuckDB rounds, so the cast itself must see an integral value. */
  private def q05(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(
        col("o_orderkey"),
        floor(col("o_totalprice")).cast("long").as("price_int"),
        col("o_orderkey").cast("string").cast("long").as("rt_key"),
        col("o_orderkey").cast("double").cast("long").as("via_double"),
        col("o_orderdate").cast("date").cast("string").as("odate"),
        lit("3.5").cast("double").as("const_d"))
      .transform(Det.emitWide(_, "o_orderkey"))

  /** q06: correlated scalar subquery — each order against its
    * customer's average. Catalyst decorrelates
    * (RewriteCorrelatedScalarSubquery) into an aggregate + join, so at
    * scale this is one extra hash aggregate on the correlation key,
    * not a per-row probe. */
  private def q06(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_q06")
    s.sql("""
      SELECT o_orderkey,
             round(o_totalprice - (SELECT avg(o2.o_totalprice)
                                   FROM orders_q06 o2
                                   WHERE o2.o_custkey = o1.o_custkey)
                   + 0.000123, 2) AS diff_from_cust_avg
      FROM orders_q06 o1
    """).transform(Det.emitWide(_, "o_orderkey"))
  }

  /** q07: IN / NOT IN subqueries → rewritten to semi/anti joins
    * (RewritePredicateSubquery) — never a per-row scan. */
  private def q07(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer_q07")
    orders(s, d).createOrReplaceTempView("orders_q07")
    s.sql("""
      SELECT c_custkey, c_name
      FROM customer_q07
      WHERE c_custkey IN (SELECT o_custkey FROM orders_q07
                          WHERE o_totalprice > 400000.0)
    """).transform(Det.emitWide(_, "c_custkey"))
  }

  /** q08: CTE (WITH clause) — two chained CTEs; Catalyst inlines or
    * reuses them by cost, nothing materializes unless referenced
    * twice. */
  private def q08(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_q08")
    s.sql("""
      WITH big AS (SELECT o_custkey, o_totalprice FROM orders_q08
                   WHERE o_totalprice > 200000.0),
           per_cust AS (SELECT o_custkey, count(1) AS n,
                               round(sum(o_totalprice), 2) AS total
                        FROM big GROUP BY o_custkey)
      SELECT o_custkey, n, total FROM per_cust WHERE n >= 2
    """).transform(Det.emitWide(_, "o_custkey"))
  }

  /** q09: lateral join (T-SQL CROSS APPLY) — per outer row, a
    * correlated derived table: each customer's 2 most recent orders.
    * Catalyst decorrelates the lateral subquery; the window-rank
    * rewrite is what it plans, so this stays one shuffle by custkey. */
  private def q09(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer_q09")
    orders(s, d).createOrReplaceTempView("orders_q09")
    s.sql("""
      SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
      FROM customer_q09 c,
           LATERAL (SELECT o_orderkey, o_totalprice FROM orders_q09
                    WHERE o_custkey = c.c_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) o
      WHERE c.c_custkey <= 200
    """).transform(Det.emitWide(_, "c_custkey", "o_orderkey"))
  }

  // ---- §2.3 joins -------------------------------------------------------

  /** q10: equi inner join; shuffles both sides on the key → SMJ/SHJ
    * picked by the planner (AQE can switch to broadcast at runtime). */
  private def q10(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d); val c = customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        round(col("o_totalprice"), 2).as("price"))
      .transform(Det.emitWide(_, "o_orderkey"))
  }

  /** q11: left outer join with null extension. */
  private def q11(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).where(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .transform(Det.emitWide(_, col("c_custkey").asc, col("o_orderkey").asc_nulls_last))
  }

  /** q12: full outer join; customers <= 50 removed so both sides have
    * unmatched rows. coalesce(c,s) is unique per output row → total order. */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).where(col("c_custkey") > 50)
    val sp = supplier(s, d)
    c.join(sp, c("c_custkey") === sp("s_suppkey"), "full")
      .select(col("c_custkey"), col("s_suppkey"), col("c_name"), col("s_name"))
      .transform(Det.emitWide(_, coalesce(col("c_custkey"), col("s_suppkey")).asc))
  }

  /** q13: left semi = EXISTS. Only the probe side is output, so Spark
    * builds a hash set of keys (no row multiplication at scale). */
  private def q13(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val big = orders(s, d).where(col("o_totalprice") > 300000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .transform(Det.emitWide(_, "c_custkey"))
  }

  /** q14: left anti = NOT EXISTS. */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val big = orders(s, d).where(col("o_totalprice") > 300000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .transform(Det.emitWide(_, "c_custkey"))
  }

  /** q15: explicit broadcast of the small dim side (nation⋈region is
    * ~25 rows at any SF — never shuffle the fact table for it). */
  private def q15(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d); val n = nation(s, d); val r = region(s, d)
    val dim = n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("r_name"))
    c.join(broadcast(dim), c("c_nationkey") === dim("n_nationkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("r_name")
  }

  /** q16: θ-join (pure inequality) → BroadcastNestedLoopJoin with the
    * 5-row region side broadcast; cost is |supplier| × 5, linear at scale. */
  private def q16(s: SparkSession, d: String): DataFrame = {
    val sp = supplier(s, d); val r = region(s, d)
    sp.join(broadcast(r), sp("s_acctbal") > r("r_regionkey") * 2000.0)
      .select(col("s_suppkey"), col("r_regionkey"), round(col("s_acctbal"), 2).as("bal"))
      .transform(Det.emitWide(_, "s_suppkey", "r_regionkey"))
  }

  /** q17: range join = equi key + date-band predicate. The equi key
    * carries the shuffle; the band is a post-join filter, so this stays
    * a hash/sort-merge join (not a nested loop) at any scale. */
  private def q17(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d); val o = orders(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey") &&
        l("l_shipdate") >= o("o_orderdate") &&
        l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
      .orderBy("l_returnflag")
  }

  /** q18: as-of join — each 'error' event picks the latest 'purchase'
    * of the same user at-or-before its (second-truncated) time, via
    * the generic graft.operators.AsOfJoin (union-tag + keyed window:
    * one shuffle by user_id, per-key carried state — see its scaladoc
    * for the scale analysis). Ties within a second break on
    * max(event_id) through AsOfJoin's deterministic value-tuple pick
    * (SURVEY §7.4-4). Oracle: DuckDB native ASOF JOIN. */
  private def q18(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).withColumn("tsec", date_trunc("second", col("ts")))
    val errs = e.where(col("event_type") === "error")
      .select("event_id", "user_id", "tsec")
    val purch = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("tsec"), col("event_id").as("purchase_id"))
    graft.operators.AsOfJoin.backward(errs, purch,
        keys = Seq("user_id"), leftTs = "tsec", rightTs = "tsec")
      .where(col("purchase_id").isNotNull)
      .select("event_id", "user_id", "purchase_id")
      .transform(Det.emitWide(_, "event_id"))
  }

  /** q19: multiway star join; dims broadcast, fact shuffles once.
    * Catalyst's ReorderJoin/CBO picks the order; AQE fixes it at runtime. */
  private def q19(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d); val n = nation(s, d)
    val c = customer(s, d); val o = orders(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("r_name")
  }

  // ---- §2.4 aggregations ------------------------------------------------

  /** q20: ungrouped aggregate — partial per partition, single final. */
  private def q20(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      count(lit(1)).as("n"),
      round(sum("l_quantity"), 2).as("sum_qty"),
      Det.r4e(avg("l_quantity")).as("avg_qty"),
      round(min("l_extendedprice"), 2).as("min_price"),
      round(max("l_extendedprice"), 2).as("max_price"))

  /** q21: the reference's flagship shape — SUM(CAST(...)) GROUP BY
    * (README.md:179,191) as a partial+final hash aggregate. */
  private def q21(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        Det.r4e(avg("l_discount")).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q22: DISTINCT aggregates — planner expands to a two-phase
    * (expand + 2×shuffle) plan; distinct sets stay bounded per group. */
  private def q22(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        round(sum_distinct(col("l_quantity")), 2).as("sd_qty"))
      .orderBy("l_returnflag")

  /** q23: HAVING = filter over the aggregate. */
  private def q23(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .where(col("n") > 12)
      .orderBy("o_custkey")

  /** q24: ROLLUP with grouping() disambiguation; null group keys are
    * coalesced to '(all)' so null ordering never matters. */
  private def q24(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
        grouping("o_orderstatus").cast("int").as("g_status"),
        grouping("o_orderpriority").cast("int").as("g_prio"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("prio"),
        col("g_status"), col("g_prio"), col("n"), col("total"))
      .orderBy("g_status", "g_prio", "status", "prio")

  /** q25: CUBE over two keys. */
  private def q25(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), Det.r4e(avg("o_totalprice")).as("avg_price"),
        grouping("o_orderstatus").cast("int").as("g_status"),
        grouping("o_orderpriority").cast("int").as("g_prio"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("prio"),
        col("g_status"), col("g_prio"), col("n"), col("avg_price"))
      .orderBy("g_status", "g_prio", "status", "prio")

  /** q26: explicit GROUPING SETS via SQL (the DSL has no direct form). */
  private def q26(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders")
    s.sql("""
      SELECT coalesce(o_orderstatus, '(all)') AS status,
             coalesce(o_orderpriority, '(all)') AS prio,
             cast(grouping(o_orderstatus) AS int) AS g_status,
             cast(grouping(o_orderpriority) AS int) AS g_prio,
             count(1) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY g_status, g_prio, status, prio
    """)
  }

  /** q27: statistical aggregates (single-pass moment sketches). */
  private def q27(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        Det.r4e(stddev_samp(col("l_quantity"))).as("sd_qty"),
        Det.r4e(var_samp(col("l_quantity"))).as("var_qty"),
        Det.r4e(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
        Det.r2e(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("covar_qp"))
      .orderBy("l_returnflag")

  /** q197: OLS REGRESSION aggregates (round 15 — the SQL-standard
    * regr_* family, completing q27's second-moment stats with the
    * fitted line itself): per return flag, regr_count/slope/
    * intercept/r2/avgx/avgy of extendedprice on quantity — the
    * one-pass distributed least-squares every profiling/drift
    * dashboard runs. All six are ratios of co-moment sums — one
    * map-side-combined hash aggregate, O(groups) state, no second
    * pass. Rounding grids sized to each statistic's magnitude
    * (slope/avgx r4e; intercept/avgy price-scaled r2e; r2 ~1e-5 on
    * this data → r6e), epsilon-shifted per the Det contract since
    * both engines accumulate co-moments in different orders. */
  private def q197(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("regr_count(l_extendedprice, l_quantity)").as("rc"),
        Det.r4e(expr("regr_slope(l_extendedprice, l_quantity)")).as("slope"),
        Det.r2e(expr("regr_intercept(l_extendedprice, l_quantity)")).as("icept"),
        Det.r6e(expr("regr_r2(l_extendedprice, l_quantity)")).as("r2"),
        Det.r4e(expr("regr_avgx(l_extendedprice, l_quantity)")).as("avgx"),
        Det.r2e(expr("regr_avgy(l_extendedprice, l_quantity)")).as("avgy"))
      .orderBy("l_returnflag")

  /** q28: HLL approximate distinct — constant memory per group at any
    * scale (vs exact distinct's O(n) state). No SQL oracle (approx);
    * bounded vs exact in ApproxSpec (SURVEY §2.4). */
  private def q28(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")

  /** q46: PIVOT — wide conditional aggregation over a small pinned
    * status domain (explicit value list keeps the plan a single
    * partial+final aggregate; an unpinned pivot needs a distinct-scan
    * first). */
  private def q46(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .orderBy("o_orderpriority")

  /** q47: UNPIVOT/melt — the wide form of q46 back to long. */
  private def q47(s: SparkSession, d: String): DataFrame =
    q46(s, d)
      .unpivot(Array(col("o_orderpriority")), Array(col("F"), col("O"), col("P")),
        "status", "total")
      .orderBy("o_orderpriority", "status")

  /** q59: string aggregation (T-SQL STRING_AGG) — deterministic via
    * sorted distinct set, so cross-engine order never flaps. */
  private def q59(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(concat_ws(",", array_sort(collect_set("o_orderpriority"))).as("prios"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** q29: exact percentiles (T-SQL PERCENTILE_CONT / MEDIAN) — both
    * engines define the continuous quantile by linear interpolation,
    * so exact forms compare; approx_percentile is engine-specific and
    * stays ScalaTest-bounded like q28. NOT the builtin `percentile()`:
    * that buffers each group's entire value multiset in one
    * aggregation buffer (3 groups here → the whole column in 3 tasks
    * at any cluster size — the suite's former scale-killer). Routed
    * through DistributedRank.quantiles — exact interpolated quantiles
    * from bucketed prefix counts, bit-identical to the builtin
    * (AlgebraProps pins the equivalence), with every shuffle keyed on
    * (group, value) or (group, bucket). q37 remains the sketch
    * alternative when approximate is acceptable. */
  private def q29(s: SparkSession, d: String): DataFrame =
    graft.operators.DistributedRank.quantiles(
        lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice")),
        Seq("l_returnflag"), "l_extendedprice",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95),
        // prices are continuous: declare the value frame large
        // (adaptiveCut = 0) and skip the smallness-probe job
        adaptiveCut = 0)
      .select(col("l_returnflag"),
        Det.r4e(col("p25")).as("p25"),
        Det.r4e(col("p50")).as("p50"),
        Det.r4e(col("p95")).as("p95"))
      // emit, not orderBy: a 3-row result does not need a range sort
      .transform(Det.emit(_, "l_returnflag"))

  /** q37: approx percentiles — the 100 TB twin of q29. The
    * Greenwald-Khanna sketch behind approx_percentile keeps
    * O(1/accuracy) state per group regardless of group size, where
    * q29's exact form buffers the whole value multiset. No SQL oracle
    * (sketch results are engine-specific); OperatorSpec bounds every
    * output within 5% relative error of the exact q29 values. */
  private def q37(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("p25"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("p95"))
      .orderBy("l_returnflag")

  /** q118: equi-width histogram of l_extendedprice (20 buckets) — the
    * column-profiling scan every stats/quality pass runs: global
    * min/max reduce to a 1-row broadcast, bucket assignment is one
    * map-side floor over the rescan, counts/sums hash-aggregate on the
    * bounded bucket key. Two linear passes total (the min/max pass is
    * unavoidable for equi-WIDTH bins; equi-DEPTH bins are q29/q37's
    * percentile territory). floor((x−mn)/width) is a single-IEEE-op
    * chain, so bucket ids agree bit-for-bit across engines; the top
    * value clamps into the last bucket. */
  private def q118(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_extendedprice").as("x"))
    val mm = li.agg(min("x").as("mn"), max("x").as("mx"))
    li.crossJoin(broadcast(mm))
      .select(
        least(floor((col("x") - col("mn")) / ((col("mx") - col("mn")) / 20.0)),
          lit(19.0)).cast("int").as("bucket"),
        col("x"), col("mn"), col("mx"))
      .groupBy("bucket")
      .agg(
        Det.r4e(min("mn") + col("bucket") * ((min("mx") - min("mn")) / 20.0))
          .as("lo"),
        count(lit(1)).as("n"), round(sum("x"), 2).as("sx"))
      .orderBy("bucket")
  }

  /** q110: bloom-pruned fact-to-dim join — the explicit runtime-filter
    * pattern for the 100 TB fact-to-fact path (operators/BloomPrune).
    * The build side (high-value orders) is sketched into a broadcast
    * bloom filter; lineitem rows whose l_orderkey cannot match drop
    * map-side BEFORE the join boundary, so at scale the probe shuffle
    * carries ~selectivity × |fact| rows. False positives are removed
    * by the exact join — the oracle is the plain-join SQL, proving the
    * prune is semantically free. */
  private def q110(s: SparkSession, d: String): DataFrame = {
    val dim = orders(s, d).where(col("o_totalprice") > 400000.0)
      .select("o_orderkey", "o_orderpriority")
    val fact = lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    graft.operators.BloomPrune
      .prunedJoin(fact, dim, "l_orderkey", "o_orderkey",
        expectedItems = 1L << 20)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"),
        round(col("l_extendedprice"), 2).as("price"))
      .transform(Det.emitWide(_, "l_orderkey", "l_linenumber"))
  }

  /** q153: bucketized point-in-interval join (operators.IntervalJoin)
    * — lineitems shipped within a week of a top-value order's date,
    * counted per priority. The PURE non-equi join (no shared equi
    * key): Spark's only native plans are BroadcastNestedLoopJoin /
    * cartesian, fatal when both sides are fact-sized. The bucket
    * rewrite turns it into an equi join on ⌊day/width⌋ with an exact
    * residual — semantically free, proven by the oracle being the
    * PLAIN theta join (the q110 contract discipline). Interval side
    * filtered to the top ~1% of orders by value: the fan-out knob a
    * real query would also carry (the probe side stays whole-table).
    * Plan-gated: no BNLJ/cartesian anywhere. */
  private def q153(s: SparkSession, d: String): DataFrame = {
    val epoch = lit("1970-01-01")
    val iv = orders(s, d).where(col("o_totalprice") > 495000.0)
      .select(col("o_orderpriority"),
        datediff(col("o_orderdate"), epoch).cast("long").as("lo"))
      .withColumn("hi", col("lo") + 7)
    val pts = lineitem(s, d)
      .select(datediff(col("l_shipdate"), epoch).cast("long").as("p"))
    graft.operators.IntervalJoin
      .pointInInterval(pts, iv, "p", "lo", "hi", maxLen = 7)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .transform(Det.emit(_, "o_orderpriority"))
  }

  /** q154: interval-OVERLAP self-join — pairs of top-value orders
    * whose 7-day fulfilment windows intersect, counted per priority
    * pair (the band-collision census behind contention/backlog
    * analyses). Same bucket rewrite as q153 but interval×interval,
    * and DEDUP-FREE: a pair co-occupies several buckets yet survives
    * only in max(⌊loA/w⌋, ⌊loB/w⌋) — the first common bucket — so no
    * distinct shuffle runs (multiplicity property-pinned). Oracle is
    * the plain double-band theta join. */
  private def q154(s: SparkSession, d: String): DataFrame = {
    val epoch = lit("1970-01-01")
    val top = orders(s, d).where(col("o_totalprice") > 495000.0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(col("o_orderdate"), epoch).cast("long").as("lo"))
      .withColumn("hi", col("lo") + 7)
    val l = top.select(col("o_orderkey").as("ak"),
      col("o_orderpriority").as("ap"), col("lo").as("alo"), col("hi").as("ahi"))
    val r = top.select(col("o_orderkey").as("bk"),
      col("o_orderpriority").as("bp"), col("lo").as("blo"), col("hi").as("bhi"))
    graft.operators.IntervalJoin
      .intervalOverlap(l, r, "alo", "ahi", "blo", "bhi", maxLen = 7)
      .where(col("ak") < col("bk"))
      .groupBy(col("ap"), col("bp")).agg(count(lit(1)).as("n"))
      .transform(Det.emit(_, "ap", "bp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_interval_join" -> q153,
    "q154_interval_overlap" -> q154,
    "q01_scan_project" -> q01, "q02_scan_pushdown" -> q02,
    "q03_filter_compound" -> q03, "q04_project_case" -> q04,
    "q05_cast_types" -> q05,
    "q06_scalar_subquery" -> q06, "q07_in_subquery" -> q07,
    "q08_cte" -> q08, "q09_lateral" -> q09,
    "q46_pivot" -> q46, "q47_unpivot" -> q47, "q59_string_agg" -> q59,
    "q10_join_inner" -> q10, "q11_join_left" -> q11, "q12_join_full" -> q12,
    "q13_join_semi" -> q13, "q14_join_anti" -> q14, "q15_join_broadcast" -> q15,
    "q16_join_theta" -> q16, "q17_join_range" -> q17, "q18_join_asof" -> q18,
    "q19_join_multiway" -> q19, "q110_bloom_prune_join" -> q110,
    "q20_agg_global" -> q20, "q21_agg_group" -> q21, "q22_agg_distinct" -> q22,
    "q23_agg_having" -> q23, "q24_agg_rollup" -> q24, "q25_agg_cube" -> q25,
    "q26_agg_grouping_sets" -> q26, "q27_agg_stats" -> q27,
    "q197_regression" -> q197,
    "q28_agg_approx_distinct" -> q28, "q29_percentiles" -> q29,
    "q37_percentiles_approx" -> q37, "q118_histogram" -> q118)

  val oracles: Map[String, String] = Map(
    "q154_interval_overlap" ->
      """SELECT a.o_orderpriority AS ap, b.o_orderpriority AS bp,
                CAST(count(1) AS BIGINT) AS n
         FROM (SELECT * FROM orders WHERE o_totalprice > 495000) a
         JOIN (SELECT * FROM orders WHERE o_totalprice > 495000) b
           ON a.o_orderkey < b.o_orderkey
          AND a.o_orderdate <= b.o_orderdate + INTERVAL 7 DAY
          AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q153_interval_join" ->
      """SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS n
         FROM (SELECT o_orderpriority, o_orderdate FROM orders
               WHERE o_totalprice > 495000) o
         JOIN lineitem
           ON l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 7 DAY
         GROUP BY 1 ORDER BY 1""",
    "q118_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS mn,
                            max(l_extendedprice) AS mx FROM lineitem),
         b AS (SELECT CAST(least(floor((l_extendedprice - mn)
                                       / ((mx - mn) / 20.0)), 19.0) AS INT) AS bucket,
                      l_extendedprice AS x, mn, mx
               FROM lineitem CROSS JOIN mm)
         SELECT bucket,
                round(min(mn) + bucket * ((min(mx) - min(mn)) / 20.0)
                      + 0.00000123, 4) AS lo,
                CAST(count(1) AS BIGINT) AS n, round(sum(x), 2) AS sx
         FROM b GROUP BY bucket ORDER BY bucket""",
    "q110_bloom_prune_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
                round(l.l_extendedprice, 2) AS price
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_totalprice > 400000.0
         ORDER BY l.l_orderkey, l.l_linenumber""",
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS l_extendedprice
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q02_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_d,
                round(l_extendedprice, 2) AS price
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_quantity < 10
         ORDER BY l_orderkey, l_linenumber""",
    "q03_filter_compound" ->
      """SELECT p_partkey, p_name, p_size, round(p_retailprice, 2) AS price
         FROM part
         WHERE p_size BETWEEN 10 AND 40
           AND (p_type LIKE '%O%' OR p_brand IN ('Brand#1','Brand#2','Brand#3'))
           AND NOT (p_retailprice < 905.0)
           AND p_name IS NOT NULL
         ORDER BY p_partkey""",
    "q04_project_case" ->
      """SELECT c_custkey,
                CASE WHEN c_acctbal < 0 THEN 'neg'
                     WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
                coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
                round(greatest(c_acctbal, 0.0), 2) AS pos_bal,
                round(least(c_acctbal, 1000.0), 2) AS capped
         FROM customer ORDER BY c_custkey""",
    "q05_cast_types" ->
      """SELECT o_orderkey,
                CAST(floor(o_totalprice) AS BIGINT) AS price_int,
                CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS rt_key,
                CAST(CAST(o_orderkey AS DOUBLE) AS BIGINT) AS via_double,
                CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
                CAST('3.5' AS DOUBLE) AS const_d
         FROM orders ORDER BY o_orderkey""",
    "q06_scalar_subquery" ->
      """SELECT o_orderkey,
                round(o_totalprice - (SELECT avg(o2.o_totalprice)
                                      FROM orders o2
                                      WHERE o2.o_custkey = o1.o_custkey)
                      + 0.000123, 2) AS diff_from_cust_avg
         FROM orders o1 ORDER BY o_orderkey""",
    "q07_in_subquery" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_totalprice > 400000.0)
         ORDER BY c_custkey""",
    "q08_cte" ->
      """WITH big AS (SELECT o_custkey, o_totalprice FROM orders
                      WHERE o_totalprice > 200000.0),
           per_cust AS (SELECT o_custkey, CAST(count(1) AS BIGINT) AS n,
                               round(sum(o_totalprice), 2) AS total
                        FROM big GROUP BY o_custkey)
         SELECT o_custkey, n, total FROM per_cust WHERE n >= 2
         ORDER BY o_custkey""",
    "q09_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
         FROM customer c,
              LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                       WHERE o_custkey = c.c_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2) o
         WHERE c.c_custkey <= 200
         ORDER BY c_custkey, o_orderkey""",
    "q46_pivot" ->
      """SELECT o_orderpriority,
                round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS "F",
                round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS "O",
                round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q47_unpivot" ->
      """WITH w AS (
           SELECT o_orderpriority,
                  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS f,
                  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS o,
                  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS p
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, status, total FROM (
           SELECT o_orderpriority, 'F' AS status, f AS total FROM w
           UNION ALL
           SELECT o_orderpriority, 'O' AS status, o AS total FROM w
           UNION ALL
           SELECT o_orderpriority, 'P' AS status, p AS total FROM w)
         WHERE total IS NOT NULL
         ORDER BY o_orderpriority, status""",
    "q59_string_agg" ->
      """SELECT o_orderstatus,
                string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios,
                CAST(count(1) AS BIGINT) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q10_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, round(o_totalprice, 2) AS price
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q11_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS price
         FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
           ON c_custkey = o.o_custkey
         ORDER BY c_custkey ASC, o_orderkey ASC NULLS LAST""",
    "q12_join_full" ->
      """SELECT c_custkey, s_suppkey, c_name, s_name
         FROM (SELECT * FROM customer WHERE c_custkey > 50) c
         FULL JOIN supplier s ON c.c_custkey = s.s_suppkey
         ORDER BY coalesce(c_custkey, s_suppkey) ASC""",
    "q13_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
         ORDER BY c_custkey""",
    "q14_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
         ORDER BY c_custkey""",
    "q15_join_broadcast" ->
      """SELECT r_name, CAST(count(1) AS BIGINT) AS n_cust,
                round(sum(c_acctbal), 2) AS total_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q16_join_theta" ->
      """SELECT s_suppkey, r_regionkey, round(s_acctbal, 2) AS bal
         FROM supplier JOIN region ON s_acctbal > r_regionkey * 2000.0
         ORDER BY s_suppkey, r_regionkey""",
    "q17_join_range" ->
      """SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n,
                round(sum(l_extendedprice), 2) AS rev
         FROM lineitem JOIN orders
           ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q18_join_asof" ->
      """WITH p AS (
           SELECT user_id, date_trunc('second', ts) AS tsec,
                  max(event_id) AS purchase_id
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         e AS (
           SELECT event_id, user_id, date_trunc('second', ts) AS tsec
           FROM events WHERE event_type = 'error')
         SELECT e.event_id, e.user_id, p.purchase_id
         FROM e ASOF JOIN p ON e.user_id = p.user_id AND e.tsec >= p.tsec
         ORDER BY e.event_id""",
    "q19_join_multiway" ->
      """SELECT r_name, CAST(count(1) AS BIGINT) AS n_orders,
                round(sum(o_totalprice), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q20_agg_global" ->
      """SELECT CAST(count(1) AS BIGINT) AS n,
                round(sum(l_quantity), 2) AS sum_qty,
                round(avg(l_quantity) + 0.00000123, 4) AS avg_qty,
                round(min(l_extendedprice), 2) AS min_price,
                round(max(l_extendedprice), 2) AS max_price
         FROM lineitem""",
    "q21_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_price,
                round(avg(l_discount) + 0.00000123, 4) AS avg_disc,
                CAST(count(1) AS BIGINT) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q22_agg_distinct" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
                CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
                round(sum(DISTINCT l_quantity), 2) AS sd_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q23_agg_having" ->
      """SELECT o_custkey, CAST(count(1) AS BIGINT) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_custkey
         HAVING count(1) > 12 ORDER BY o_custkey""",
    "q24_agg_rollup" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
                coalesce(o_orderpriority, '(all)') AS prio,
                CAST(grouping(o_orderstatus) AS INT) AS g_status,
                CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                CAST(count(1) AS BIGINT) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_prio, status, prio""",
    "q25_agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
                coalesce(o_orderpriority, '(all)') AS prio,
                CAST(grouping(o_orderstatus) AS INT) AS g_status,
                CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                CAST(count(1) AS BIGINT) AS n,
                round(avg(o_totalprice) + 0.00000123, 4) AS avg_price
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY g_status, g_prio, status, prio""",
    "q26_agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
                coalesce(o_orderpriority, '(all)') AS prio,
                CAST(grouping(o_orderstatus) AS INT) AS g_status,
                CAST(grouping(o_orderpriority) AS INT) AS g_prio,
                CAST(count(1) AS BIGINT) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY g_status, g_prio, status, prio""",
    "q27_agg_stats" ->
      """SELECT l_returnflag,
                round(stddev_samp(l_quantity) + 0.00000123, 4) AS sd_qty,
                round(var_samp(l_quantity) + 0.00000123, 4) AS var_qty,
                round(corr(l_quantity, l_extendedprice) + 0.00000123, 4) AS corr_qp,
                round(covar_samp(l_quantity, l_extendedprice) + 0.000123, 2) AS covar_qp
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q197_regression" ->
      """SELECT l_returnflag,
                CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS rc,
                round(regr_slope(l_extendedprice, l_quantity) + 0.00000123, 4) AS slope,
                round(regr_intercept(l_extendedprice, l_quantity) + 0.000123, 2) AS icept,
                round(regr_r2(l_extendedprice, l_quantity) + 0.0000000123, 6) AS r2,
                round(regr_avgx(l_extendedprice, l_quantity) + 0.00000123, 4) AS avgx,
                round(regr_avgy(l_extendedprice, l_quantity) + 0.000123, 2) AS avgy
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q29_percentiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.25) + 0.00000123, 4) AS p25,
                round(quantile_cont(l_extendedprice, 0.50) + 0.00000123, 4) AS p50,
                round(quantile_cont(l_extendedprice, 0.95) + 0.00000123, 4) AS p95
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
