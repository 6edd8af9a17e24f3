package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the operator the reference's stack offers via
  * engine SQL but Spark's DataFrame API lacks natively (SURVEY.md
  * §2.3 q18). Composed Spark-first rather than via a custom
  * `SparkStrategy`: both sides are union-tagged and a single window
  * partitioned by the join keys carries the latest right-side value
  * forward in time order.
  *
  * Scale: ONE shuffle (by the join keys) and a per-key sort — the same
  * cost profile as the sort-merge join an engine-native as-of would
  * plan. State per key is one carried struct, so no key's history is
  * ever buffered. Skewed keys behave like any window partition (AQE
  * does not split window partitions — salt the key upstream if one key
  * dominates).
  *
  * Semantics: for each left row, the latest right row with
  * `right(ts) <= left(ts)` on the same key; left rows with no earlier
  * right row get nulls. If several right rows share (key, ts), the
  * field-lexicographically greatest value tuple wins (deterministic).
  */
object AsOfJoin {

  /** @param left       probe side; all its columns are preserved
    * @param right      reference side; all non-key non-ts columns are
    *                   appended to matching left rows
    * @param keys       equi-join key columns (present on both sides)
    * @param leftTs     left event-time column name
    * @param rightTs    right event-time column name (may differ)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val valueCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(valueCols.nonEmpty, "right side carries no value columns")
    require(valueCols.forall(!left.columns.contains(_)),
      s"right value columns ${valueCols.mkString(",")} collide with left columns — rename first")
    // one deterministic value tuple per (key, ts)
    val packed = right
      .groupBy((keys :+ rightTs).map(col): _*)
      .agg(max(struct(valueCols.map(col): _*)).as("__asof_val"))
      .withColumnRenamed(rightTs, "__asof_ts")
      .withColumn("__asof_tag", lit(0))
    val probe = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_tag", lit(1))
    // tag 0 < 1: a right row at exactly left's ts is visible to it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts"), col("__asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe.unionByName(packed, allowMissingColumns = true)
      .withColumn("__asof_carried",
        last(col("__asof_val"), ignoreNulls = true).over(w))
      .where(col("__asof_tag") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => col(s"__asof_carried.$c").as(c)): _*)
  }
}
