package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{array, call_function, lit}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Quantile-bucket assignment by binary search: the number of `bounds`
  * strictly below `value` — i.e. the index of the quantile range the
  * value falls in, identical to `size(filter(array(bounds), b => v > b))`
  * but O(log n) per row instead of O(n).
  *
  * Why an Expression: DistributedRank derives every two-phase shuffle
  * key from ONE driver-computed sorted quantile array (SURVEY §2.5 —
  * the device that makes bucket placement agree across phases). The
  * composable `size(filter(...))` form scans the whole bounds array
  * per row; at numRanges ≈ a real cluster's core count (hundreds to
  * thousands) that is a per-row O(n) loop on the hottest path of the
  * operator. This expression binary-searches a shared double[] inside
  * whole-stage codegen.
  *
  * Null handling matches the filter form: a null value yields bucket 0
  * (nulls sort first in every consumer's window, so bucket 0 is where
  * null rows belong). `boundsExpr` must be a foldable array<double>
  * literal, sorted ascending and duplicate-free (DistributedRank's
  * `.distinct.sorted` quantile arrays by construction).
  */
case class BucketSearch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "bucket_search"

  private lazy val bounds: Array[Double] =
    right.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) 0
    else BucketSearch.bucketOf(bounds, v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bounds", bounds, "double[]")
    val vGen = left.genCode(ctx)
    val idx = ctx.freshName("idx")
    ev.copy(code = code"""
      ${vGen.code}
      int ${ev.value} = 0;
      if (!${vGen.isNull}) {
        int $idx = java.util.Arrays.binarySearch($b, ${vGen.value});
        ${ev.value} = $idx >= 0 ? $idx : -($idx + 1);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketSearch =
    copy(left = newLeft, right = newRight)
}

object BucketSearch {
  /** Bounds are distinct and sorted, so an exact hit at index i has
    * exactly i bounds strictly below it, and a miss's insertion point
    * IS the count of smaller bounds. */
  def bucketOf(bounds: Array[Double], v: Double): Int = {
    val idx = java.util.Arrays.binarySearch(bounds, v)
    if (idx >= 0) idx else -(idx + 1)
  }

  /** Idempotent — see SimHash64.register. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bucket_search")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bucket_search", exprs => BucketSearch(exprs(0), exprs(1)), "built-in")

  /** Column form: bucket id of `c` against the driver-computed sorted
    * `bounds`. Registers on `spark` and routes through the registry so
    * callers never need a Column-from-Expression bridge. */
  def of(spark: SparkSession, c: Column, bounds: Array[Double]): Column = {
    register(spark)
    call_function("bucket_search", c.cast("double"),
      array(bounds.map(lit(_)): _*))
  }
}
