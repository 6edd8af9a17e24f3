package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Salted two-phase top-k per group.
  *
  * NOTE (measured on Spark 4, see q36's scaladoc): for plain
  * rank/row_number/dense_rank filters, Spark's WindowGroupLimit rule
  * already inserts a PARTIAL map-side top-k before the window's
  * shuffle, so the ordinary window idiom is skew-proof on its own —
  * prefer it. This operator remains for shapes that rule does not
  * serve (a limit decided at runtime, pre-aggregated weights, or
  * engines/planners without the rule): a local top-k within
  * (group, salt) bounds every task's state to k rows, then the exact
  * top-k re-ranks the k·salts survivors per group.
  *
  * The ordering must be made total by the caller (tie-break on a
  * unique column) for the result to be deterministic — same rule as
  * the window form (SURVEY §7.4-4).
  */
object TopK {

  /** @param df       input
    * @param groupCols grouping key
    * @param ordering  total-order sort columns (e.g. `price.desc, id.asc`)
    * @param k         rows kept per group
    * @param salts     fan-out of the first phase; ≈ cores touching a
    *                  skewed group. 1 degenerates to the plain window.
    * @return input rows + `rn` (1-based rank within the group)
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], ordering: Seq[Column],
      k: Int, salts: Int = 32): DataFrame = {
    val localW = Window
      .partitionBy((groupCols.map(col) :+ col("__salt")): _*)
      .orderBy(ordering: _*)
    val finalW = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df
      // non-deterministic salt is fine: it only routes rows, the final
      // exact rank never depends on which salt a row landed in
      .withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .withColumn("__lrn", row_number().over(localW))
      .where(col("__lrn") <= k)
      .withColumn("rn", row_number().over(finalW))
      .where(col("rn") <= k)
      .drop("__salt", "__lrn")
  }
}
