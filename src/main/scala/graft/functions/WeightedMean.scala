package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** User-defined aggregate surface (SURVEY.md §2.7 "UDF surface"):
  * a typed `Aggregator[IN, BUF, OUT]` registered through
  * `functions.udaf`, the Spark-4 idiom for custom aggregation (the
  * old `UserDefinedAggregateFunction` is deprecated).
  *
  * Semantics: weighted mean Σ(w·x)/Σ(w). The buffer is two doubles,
  * `merge` is associative and commutative, so Spark runs it as a
  * partial+final hash aggregate exactly like a built-in — constant
  * state per group, map-side combine, one shuffle of (Σwx, Σw) pairs
  * per group at any corpus size. Exercised as q98 with a DuckDB
  * oracle computing the same ratio from plain sums.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  // (x, w) -> buffer (Σ w·x, Σ w)
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Register for SQL/expr use: `wmean(x, w)`. Idempotent — see
    * SimHash64.register. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("wmean")))
      spark.udf.register("wmean", functions.udaf(WeightedMean))
}
