package graft.functions

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** T-SQL `JSON_VALUE(json, path)` with EXACT error semantics — the
  * reference's core extraction expression
  * (/root/reference/README.md:178-179) beyond what `get_json_object`
  * gives (SURVEY §4 declared this deferred; closed here):
  *
  *  - path modes: optional `lax ` (default) / `strict ` prefix;
  *  - member steps `.name` and QUOTED `."name with spaces"` (the
  *    reference's `$.after."city"` shape), array steps `[n]`;
  *    quoted members honour backslash escapes (`\"`, `\\`, `\/`);
  *    unquoted names are identifier-shaped (`[A-Za-z0-9_]+`) — any
  *    other character must be quoted or the path errors loudly
  *    (T-SQL likewise requires quoting there);
  *  - scalar-only: an object/array at the path is NULL in lax mode and
  *    an ERROR in strict (get_json_object returns the raw JSON text —
  *    the silent divergence this expression exists to remove);
  *  - missing member/index: NULL in lax, ERROR in strict;
  *  - malformed JSON text: ERROR in BOTH modes (T-SQL raises "JSON
  *    text is not properly formatted" regardless of mode — guard with
  *    `is_json`, exactly as a T-SQL user guards with ISJSON);
  *  - values longer than 4000 chars (JSON_VALUE returns
  *    nvarchar(4000)): NULL in lax, ERROR in strict;
  *  - JSON `null` scalar and SQL NULL input both yield NULL.
  *
  * The path must be foldable (T-SQL requires a constant path); parsed
  * forms are cached. Codegen is a static call — the expression stays
  * inside whole-stage codegen like the other native functions.
  */
case class JsonValue(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_value"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("json_value expects (string json, string path)")
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("json_value: the path must be a constant (T-SQL contract)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val j = left.eval(input)
    if (j == null) null
    else {
      val p = right.eval(input)
      if (p == null) null
      else JsonValue.extractU(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) => s"""
      ${ev.value} = graft.functions.JsonValue.extractU($j, $p);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonValue =
    copy(left = newLeft, right = newRight)
}

object JsonValue {
  sealed trait Seg
  final case class Member(name: String) extends Seg
  final case class Index(i: Int) extends Seg

  /** One mapper for all tasks; FAIL_ON_TRAILING_TOKENS makes
    * `{"a":1} garbage` malformed, matching T-SQL (and DuckDB's
    * json_valid). */
  private lazy val mapper: ObjectMapper =
    new ObjectMapper().enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  /** Paths are foldable literals — a handful per query; cache parses. */
  private val pathCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Array[Seg])]()

  /** `lax $.a."b c"[0].d` → (strict?, segments). Throws on syntax
    * errors (T-SQL: "JSON path is not properly formatted"). */
  def parsePath(path: String): (Boolean, Array[Seg]) = {
    val (strict, rest) =
      if (path.startsWith("strict ")) (true, path.stripPrefix("strict ").trim)
      else if (path.startsWith("lax ")) (false, path.stripPrefix("lax ").trim)
      else (false, path.trim)
    def fail() = throw new IllegalArgumentException(
      s"JSON path is not properly formatted: '$path'")
    if (rest.isEmpty || rest.charAt(0) != '$') fail()
    val segs = scala.collection.mutable.ArrayBuffer[Seg]()
    var i = 1
    while (i < rest.length) {
      rest.charAt(i) match {
        case '.' =>
          i += 1
          if (i >= rest.length) fail()
          if (rest.charAt(i) == '"') {
            // quoted member with backslash escapes: `."a\"b"` names
            // the member `a"b`; `\\` is a literal backslash. Any other
            // escape is a path syntax error (loud, not truncated).
            val sb = new java.lang.StringBuilder
            var j = i + 1
            var closed = false
            while (j < rest.length && !closed) {
              rest.charAt(j) match {
                case '"' => closed = true; j += 1
                case '\\' =>
                  if (j + 1 >= rest.length) fail()
                  rest.charAt(j + 1) match {
                    case c @ ('"' | '\\' | '/') => sb.append(c)
                    case _ => fail()
                  }
                  j += 2
                case c => sb.append(c); j += 1
              }
            }
            if (!closed || sb.length == 0) fail()
            segs += Member(sb.toString)
            i = j
          } else {
            val start = i
            while (i < rest.length && (rest.charAt(i).isLetterOrDigit || rest.charAt(i) == '_')) i += 1
            if (i == start) fail()
            segs += Member(rest.substring(start, i))
          }
        case '[' =>
          val end = rest.indexOf(']', i)
          if (end < 0) fail()
          val n = try rest.substring(i + 1, end).trim.toInt catch { case _: NumberFormatException => fail() }
          if (n < 0) fail()
          segs += Index(n)
          i = end + 1
        case _ => fail()
      }
    }
    (strict, segs.toArray)
  }

  /** Parse `json` and walk `path` to its node — the shared machinery
    * of JSON_VALUE / JSON_QUERY / OPENJSON. Returns (strict?, node or
    * null-for-missing); malformed text throws in BOTH modes (T-SQL). */
  private[functions] def navigate(json: String, path: String): (Boolean, JsonNode) = {
    val (strict, segs) = pathCache.computeIfAbsent(path, parsePath _)
    val root: JsonNode =
      try mapper.readTree(json)
      catch { case e: Exception =>
        // T-SQL raises in BOTH modes on malformed text
        throw new IllegalArgumentException(
          s"JSON text is not properly formatted: ${e.getMessage}")
      }
    var node: JsonNode = root
    var i = 0
    while (i < segs.length && node != null) {
      node = segs(i) match {
        case Member(n) => if (node.isObject) node.get(n) else null
        case Index(n)  => if (node.isArray) node.get(n) else null
      }
      i += 1
    }
    (strict, node)
  }

  /** Core evaluation — null means SQL NULL; strict-mode misses throw. */
  def extract(json: String, path: String): String = {
    val (strict, node) = navigate(json, path)
    def miss(what: String): String =
      if (strict) throw new IllegalArgumentException(
        s"json_value (strict): $what at path '$path'")
      else null
    node match {
      case null => miss("property does not exist")
      case n if n.isNull => null
      case n if n.isValueNode =>
        val t = n.asText()
        if (t.length > 4000) miss("value exceeds nvarchar(4000)") else t
      case _ => miss("value is not a scalar (object or array found)")
    }
  }

  def extractU(json: UTF8String, path: UTF8String): UTF8String = {
    val r = extract(json.toString, path.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Idempotent — see SimHash64.register. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("json_value")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "json_value", exprs => JsonValue(exprs(0), exprs(1)), "built-in")
}

/** T-SQL `JSON_QUERY(json, path)` — the fragment-returning sibling of
  * [[JsonValue]], closing the JSON surface split T-SQL draws: JSON_VALUE
  * extracts SCALARS (object/array → NULL-lax/error-strict), JSON_QUERY
  * extracts FRAGMENTS (object/array → their JSON text; scalar →
  * NULL-lax/error-strict — the mirror image). Same path grammar, same
  * parser, same cache, same malformed-text rule (error in BOTH modes).
  *
  * The returned fragment is the node re-serialized compactly (no
  * whitespace) — construct comparison fixtures compactly and the text
  * round-trips byte-identically (the q155 oracle relies on this).
  * Codegen is a static call; stays inside whole-stage codegen. */
case class JsonQuery(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_query"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType || right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("json_query expects (string json, string path)")
    else if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("json_query: the path must be a constant (T-SQL contract)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val j = left.eval(input)
    if (j == null) null
    else {
      val p = right.eval(input)
      if (p == null) null
      else JsonQuery.extractU(j.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, p) => s"""
      ${ev.value} = graft.functions.JsonQuery.extractU($j, $p);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonQuery =
    copy(left = newLeft, right = newRight)
}

object JsonQuery {
  /** Fragment extraction — NULL means SQL NULL; strict misses throw. */
  def extract(json: String, path: String): String = {
    val (strict, node) = JsonValue.navigate(json, path)
    def miss(what: String): String =
      if (strict) throw new IllegalArgumentException(
        s"json_query (strict): $what at path '$path'")
      else null
    node match {
      case null => miss("property does not exist")
      case n if n.isObject || n.isArray => n.toString
      case _ => miss("value is not an object or array (scalar found)")
    }
  }

  def extractU(json: UTF8String, path: UTF8String): UTF8String = {
    val r = extract(json.toString, path.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Idempotent — see SimHash64.register. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("json_query")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "json_query", exprs => JsonQuery(exprs(0), exprs(1)), "built-in")
}

/** T-SQL `ISJSON(s)` — 1 iff `s` is a complete, valid JSON OBJECT or
  * ARRAY (the classic pre-2022 semantics: bare scalars are 0; so is a
  * valid value followed by trailing garbage), NULL on NULL input.
  * This is the guard T-SQL composes in front of JSON_VALUE — the
  * quarantine test of README.md:188-190 — and its truth agrees with
  * DuckDB's `json_valid` on object-shaped inputs, so oracle queries
  * translate 1:1. */
case class IsJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "is_json"

  override protected def nullSafeEval(s: Any): Any =
    IsJson.check(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.IsJson.check($s)")

  override protected def withNewChildInternal(newChild: Expression): IsJson =
    copy(child = newChild)
}

object IsJson {
  private lazy val mapper: ObjectMapper =
    new ObjectMapper().enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)

  def check(s: UTF8String): Int =
    try {
      val n = mapper.readTree(s.toString)
      if (n != null && (n.isObject || n.isArray)) 1 else 0
    } catch { case _: Exception => 0 }

  /** Idempotent — see SimHash64.register. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("is_json")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "is_json", exprs => IsJson(exprs.head), "built-in")
}
