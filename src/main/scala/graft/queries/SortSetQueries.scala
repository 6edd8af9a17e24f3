package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sorts, limits and set operations (SURVEY.md §2.6). All built-ins:
  * global sort is a range-partitioned exchange + per-partition sort
  * (scales to any size); ORDER BY + LIMIT short-circuits to
  * TakeOrderedAndProject (per-partition top-k, then k·partitions rows
  * to the driver — never a full global sort). */
object SortSetQueries {

  /** q40: multi-key sort, mixed ASC/DESC with explicit null placement. */
  private def q40(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_shipdate").cast("date").cast("string").as("ship_d"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_returnflag").desc_nulls_last, col("ship_d").asc_nulls_first,
        col("l_orderkey").asc, col("l_linenumber").asc)

  /** q41: global top-k → TakeOrderedAndProjectExec, no full sort. */
  private def q41(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey").asc)
      .limit(100)

  /** q42: bag union (UNION ALL) of two heterogeneous projections. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_custkey").as("id"),
      col("c_name").as("name"), lit("c").as("src"))
    val sp = supplier(s, d).select(col("s_suppkey").as("id"),
      col("s_name").as("name"), lit("s").as("src"))
    c.unionByName(sp).orderBy("src", "id")
  }

  /** q43: set union (UNION DISTINCT) — union + hash-distinct shuffle. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nk"))
    val sp = supplier(s, d).select(col("s_nationkey").as("nk"))
    c.union(sp).distinct().orderBy("nk")
  }

  /** q44: INTERSECT (set semantics). */
  private def q44(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nk"))
    val sp = supplier(s, d).select(col("s_nationkey").as("nk"))
    c.intersect(sp).orderBy("nk")
  }

  /** q45: EXCEPT (set semantics). */
  private def q45(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nk"))
    val sp = supplier(s, d).select(col("s_nationkey").as("nk"))
    c.except(sp).orderBy("nk")
  }

  /** q48: EXCEPT ALL / INTERSECT ALL — multiset semantics (duplicates
    * preserved by multiplicity difference/minimum), the bag twins of
    * q44/q45. */
  private def q48(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nk"))
    val sp = supplier(s, d).select(col("s_nationkey").as("nk"))
    c.exceptAll(sp).groupBy("nk").agg(count(lit(1)).as("n_remaining"))
      .orderBy("nk")
  }

  /** q49: ORDER BY + OFFSET + FETCH (T-SQL pagination) — a total-order
    * sort with offset(100).limit(50); the planner keeps it a single
    * top-(offset+limit) short-circuit, never a full materialized sort. */
  private def q49(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey").asc)
      .offset(100)
      .limit(50)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_sort_multi" -> q40, "q41_topk" -> q41, "q42_union_all" -> q42,
    "q43_union_distinct" -> q43, "q44_intersect" -> q44, "q45_except" -> q45,
    "q48_except_all" -> q48, "q49_offset_fetch" -> q49)

  val oracles: Map[String, String] = Map(
    "q40_sort_multi" ->
      """SELECT l_returnflag, CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_d,
                l_orderkey, l_linenumber
         FROM lineitem
         ORDER BY l_returnflag DESC NULLS LAST, ship_d ASC NULLS FIRST,
                  l_orderkey ASC, l_linenumber ASC""",
    "q41_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
         FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 100""",
    "q42_union_all" ->
      """SELECT * FROM (
           SELECT c_custkey AS id, c_name AS name, 'c' AS src FROM customer
           UNION ALL
           SELECT s_suppkey AS id, s_name AS name, 's' AS src FROM supplier)
         ORDER BY src, id""",
    "q43_union_distinct" ->
      """SELECT nk FROM (
           SELECT c_nationkey AS nk FROM customer
           UNION
           SELECT s_nationkey AS nk FROM supplier)
         ORDER BY nk""",
    "q44_intersect" ->
      """SELECT nk FROM (
           SELECT c_nationkey AS nk FROM customer
           INTERSECT
           SELECT s_nationkey AS nk FROM supplier)
         ORDER BY nk""",
    "q45_except" ->
      """SELECT nk FROM (
           SELECT c_nationkey AS nk FROM customer
           EXCEPT
           SELECT s_nationkey AS nk FROM supplier)
         ORDER BY nk""",
    "q48_except_all" ->
      """SELECT nk, CAST(count(1) AS BIGINT) AS n_remaining FROM (
           SELECT c_nationkey AS nk FROM customer
           EXCEPT ALL
           SELECT s_nationkey AS nk FROM supplier)
         GROUP BY nk ORDER BY nk""",
    "q49_offset_fetch" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
         FROM orders ORDER BY price DESC, o_orderkey ASC
         LIMIT 50 OFFSET 100""")
}
