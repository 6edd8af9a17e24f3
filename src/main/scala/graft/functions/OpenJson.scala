package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** T-SQL `OPENJSON(json, path)` with the DEFAULT schema, as an
  * expression returning the entry array — shred an object or array at
  * `path` into `(key, value, type)` entries; compose with
  * `explode`/`posexplode` for the rowset form (the reference consumes
  * OPENJSON as a row source over envelope JSON,
  * /root/reference/README.md:173-192). Spark-first split: the PARSE
  * stays a codegen'd scalar expression (one static call, like
  * JsonValue), the FAN-OUT is Spark's own generator — Catalyst plans
  * the explode natively, so nothing here reimplements a generator.
  *
  * T-SQL default-schema semantics, replicated exactly:
  *  - array at path → one entry per element, key = "0", "1", … (the
  *    element index as text); object → one entry per member, key =
  *    member name (original order — both engines preserve it);
  *  - `value`: strings UNQUOTED/unescaped, numbers/bools as their
  *    JSON text, nested object/array as compact JSON text, JSON null
  *    → SQL NULL;
  *  - `type`: 0 null, 1 string, 2 number, 3 bool, 4 array, 5 object
  *    (T-SQL's documented codes);
  *  - a SCALAR at the path (or a missing path): lax → NULL (explode
  *    of NULL yields zero rows — T-SQL's empty rowset), strict →
  *    error ("not an object or array");
  *  - malformed JSON text: error in BOTH modes; SQL NULL input → NULL.
  *
  * Path grammar, parser, and cache are shared with [[JsonValue]]
  * (`JsonValue.navigate`). Scale shape: per-row work is one parse +
  * one walk, map-side, inside whole-stage codegen; the explode that
  * follows fans out rows without any shuffle.
  */
case class OpenJsonEntries(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = OpenJsonEntries.schema
  override def nullable: Boolean = true
  override def prettyName: String = "openjson_entries"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("openjson_entries expects (string json, string path)")
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("openjson_entries: the path must be a constant (T-SQL contract)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val j = left.eval(input)
    if (j == null) null
    else {
      val p = right.eval(input)
      if (p == null) null
      else OpenJsonEntries.entriesU(
        j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) => s"""
      ${ev.value} = graft.functions.OpenJsonEntries.entriesU($j, $p);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): OpenJsonEntries =
    copy(left = newLeft, right = newRight)
}

object OpenJsonEntries {
  /** `array<struct<key string, value string, type int>>` — the
    * default-schema rowset, pre-explode. */
  val schema: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true),
    StructField("type", IntegerType, nullable = false))), containsNull = false)

  /** T-SQL type codes for the default schema's `type` column. */
  private def typeOf(n: JsonNode): Int =
    if (n.isNull) 0
    else if (n.isTextual) 1
    else if (n.isNumber) 2
    else if (n.isBoolean) 3
    else if (n.isArray) 4
    else 5

  /** `value` column text: unquoted strings, JSON text otherwise,
    * SQL NULL for JSON null. */
  private def valueOf(n: JsonNode): UTF8String =
    if (n.isNull) null
    else if (n.isTextual) UTF8String.fromString(n.asText())
    else UTF8String.fromString(n.toString)

  def entriesU(json: UTF8String, path: UTF8String): ArrayData = {
    val (strict, node) = JsonValue.navigate(json.toString, path.toString)
    def miss(what: String): ArrayData =
      if (strict) throw new IllegalArgumentException(
        s"openjson (strict): $what at path '$path'")
      else null
    node match {
      case null => miss("property does not exist")
      case n if n.isArray =>
        val out = new Array[Any](n.size)
        var i = 0
        while (i < n.size) {
          val e = n.get(i)
          out(i) = InternalRow(
            UTF8String.fromString(i.toString), valueOf(e), typeOf(e))
          i += 1
        }
        new GenericArrayData(out)
      case n if n.isObject =>
        val out = scala.collection.mutable.ArrayBuffer[Any]()
        val it = n.fields()
        while (it.hasNext) {
          val f = it.next()
          out += InternalRow(
            UTF8String.fromString(f.getKey), valueOf(f.getValue),
            typeOf(f.getValue))
        }
        new GenericArrayData(out.toArray)
      case _ => miss("value is not an object or array (scalar found)")
    }
  }

  /** Idempotent — see SimHash64.register. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("openjson_entries")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "openjson_entries", exprs => OpenJsonEntries(exprs(0), exprs(1)), "built-in")
}

/** T-SQL `OPENJSON(j) WITH (name TYPE '<path>' [AS JSON], …)` — the
  * TYPED projection form of OPENJSON over a single object
  * (the explicit-schema sibling of the default-schema shred above,
  * README.md:173-192's engine exposes both). Each spec column walks
  * the SAME document with the family's shared path machinery:
  * scalars through JSON_VALUE (lax/strict rules apply per path),
  * `AS JSON` columns through JSON_QUERY (fragments), then a CAST to
  * the declared Spark SQL type — exactly how T-SQL binds the WITH
  * clause. Pure composition of codegen'd expressions: one map-side
  * pass, no generator, no shuffle.
  */
object OpenJsonWith {
  /** One WITH-clause column: output name, JSON path, Spark SQL cast
    * target (e.g. "int", "string"), and the `AS JSON` flag. */
  final case class Spec(name: String, path: String, castTo: String,
      asJson: Boolean = false)

  /** Append every spec column to `df`, extracted from `jsonCol`. */
  def shred(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame, jsonCol: String,
      specs: Seq[Spec]): org.apache.spark.sql.DataFrame = {
    JsonValue.register(spark)
    JsonQuery.register(spark)
    specs.foldLeft(df) { (d, sp) =>
      val fn = if (sp.asJson) "json_query" else "json_value"
      // paths never contain single quotes (the grammar quotes members
      // with double quotes); refuse rather than mis-escape
      require(!sp.path.contains("'"),
        s"openjson_with: path must not contain single quotes: '${sp.path}'")
      d.withColumn(sp.name, org.apache.spark.sql.functions.expr(
        s"CAST($fn($jsonCol, '${sp.path}') AS ${sp.castTo})"))
    }
  }
}
