package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a 60-bit SimHash of a
  * whitespace-tokenized document (charter extension, SURVEY.md §2.10).
  *
  * Algorithm (kept bit-for-bit identical to the q88 DuckDB oracle so
  * it stays differentially testable): for every non-empty token, take
  * the first 15 hex chars of md5(token) as a 60-bit integer; each of
  * the 60 bit positions votes +1/-1; output sets bit b iff its vote
  * sum is strictly positive.
  *
  * Why an Expression rather than composed operators: the composed form
  * is a tokens×60 explode (≈ 2400 rows per document) through two hash
  * aggregations; this expression is a single map-side pass — on a
  * 100 TB corpus that is the difference between a petabyte-scale
  * shuffle and none at all. `doGenCode` emits a static call so the
  * expression stays INSIDE the whole-stage-codegen span (a
  * CodegenFallback here would split the generated pipeline and forfeit
  * operator fusion for every query using it).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64$$.MODULE$$.simhash($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Register as a SQL function: expr("simhash64(text)"). Idempotent:
    * operators register on every call path, so an unconditional
    * create-or-replace would log a "function replaced" warning per
    * query. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "simhash64", exprs => SimHash64(exprs.head), "built-in")

  def simhash(text: String): Long = {
    val votes = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    val toks = text.split(" ")
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        md.reset()
        val dig = md.digest(t.getBytes(StandardCharsets.UTF_8))
        // value of the first 15 hex chars = first 7.5 bytes, big-endian
        var hv = 0L
        var j = 0
        while (j < 15) {
          val b = dig(j >> 1)
          val nib = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
          hv = (hv << 4) | nib
          j += 1
        }
        var bit = 0
        while (bit < 60) {
          if (((hv >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}
