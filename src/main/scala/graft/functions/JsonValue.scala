package graft.functions

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

  /** Paths are foldable literals — a handful per query; cache parses.
    * Shared with [[JsonQuery]] and [[JsonModify]]. */
  private[functions] val pathCache =
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

/** T-SQL `JSON_MODIFY(json, path, newValue)` — the WRITE-path member
  * completing the JSON family (JSON_VALUE scalars / JSON_QUERY
  * fragments / OPENJSON shredding are the read side; origin I,
  * /root/reference/README.md:173-192 invokes the T-SQL engine whose
  * surface includes the modifier). Same path grammar, parser, cache,
  * and malformed-text rule (error in BOTH modes) as [[JsonValue]],
  * plus the modifier-only `append ` prefix.
  *
  * Semantics (pinned to the public T-SQL docs where they are
  * unambiguous; documented here where they are not):
  *
  *  - **set, path exists** — replace in place (member keeps its
  *    position; the document's other members are untouched).
  *  - **set, member missing** (object parent exists): lax INSERTS the
  *    member at the END of the object; strict errors ("property does
  *    not exist"). A missing/scalar PARENT errors in both modes (the
  *    modifier never fabricates intermediate objects — T-SQL's
  *    "insertion may fail" rule, made loud).
  *  - **set, array index** — in-range replaces; out-of-range APPENDS
  *    in lax (the documented lax array rule), errors in strict.
  *  - **delete (SQL NULL value)** — lax REMOVES the member/element
  *    (the docs' delete idiom `JSON_MODIFY(j,'$.x',NULL)`); a missing
  *    target is a lax no-op. Strict cannot delete: it writes a JSON
  *    `null` when the target exists and errors when it does not —
  *    the documented asymmetry (deletion is a lax-only behavior).
  *  - **append prefix** (`append $.a`, `append strict $.a`) — target
  *    array gets the value pushed; a non-array target errors in both
  *    modes ("array cannot be found"); a missing target in lax
  *    CREATES a one-element array on an existing object parent
  *    (strict errors). SQL NULL appends a JSON null (the delete rule
  *    is set-only).
  *  - **value typing** — strings are inserted as escaped JSON
  *    strings; numeric/boolean expressions as JSON numbers/booleans.
  *    A value that is itself `json_query(...)` is inserted RAW as a
  *    fragment — detected structurally at function resolution
  *    (`exprs(2).isInstanceOf[JsonQuery]`), which is exactly how
  *    T-SQL decides (JSON_QUERY's return carries a json-typed
  *    provenance flag). An invalid raw fragment errors.
  *  - **root** — `append $` pushes onto a root array; plain `$` set
  *    errors loudly (replace the column, not the document).
  *
  * Output is the Jackson-compact re-serialization (no whitespace,
  * member order = parse order with inserts at the end) — the same
  * canonical form [[JsonQuery]] returns, so q164's oracle can
  * reconstruct expected documents byte-for-byte from base columns.
  *
  * The path must be foldable (T-SQL contract). Codegen is a static
  * call: null-of-json/path propagates NULL, but a null VALUE is
  * meaningful (delete) so the generated code boxes it explicitly
  * instead of short-circuiting — the expression stays inside
  * whole-stage codegen like the rest of the family. */
case class JsonModify(first: Expression, second: Expression,
    third: Expression, raw: Boolean)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_modify"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (first.dataType != StringType || second.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("json_modify expects (string json, string path, value)")
    else if (!second.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("json_modify: the path must be a constant (T-SQL contract)")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val j = first.eval(input)
    if (j == null) return null
    val p = second.eval(input)
    if (p == null) return null
    JsonModify.applyU(j.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], third.eval(input), raw)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val jG = first.genCode(ctx)
    val pG = second.genCode(ctx)
    val vG = third.genCode(ctx)
    val vBox = ctx.freshName("jmVal")
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${jG.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      if (!${jG.isNull}) {
        ${pG.code}
        if (!${pG.isNull}) {
          ${vG.code}
          Object $vBox = ${vG.isNull} ? null : (Object) ${vG.value};
          ${ev.value} = graft.functions.JsonModify.applyU(
            ${jG.value}, ${pG.value}, $vBox, $raw);
          ${ev.isNull} = (${ev.value} == null);
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): JsonModify =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object JsonModify {
  import com.fasterxml.jackson.databind.node.JsonNodeFactory
  private lazy val mapper: ObjectMapper =
    new ObjectMapper().enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
  private val nodes = JsonNodeFactory.instance

  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"json_modify: $msg")

  /** Boxed Spark value → Jackson node. `raw` parses a fragment. */
  private def toNode(v: Any, raw: Boolean): JsonNode = v match {
    case null => nodes.nullNode
    case s @ (_: UTF8String | _: String) =>
      if (raw)
        try mapper.readTree(s.toString)
        catch { case e: Exception =>
          err(s"new value is not valid JSON: ${e.getMessage}") }
      else nodes.textNode(s.toString)
    case i: java.lang.Integer => nodes.numberNode(i.intValue)
    case l: java.lang.Long    => nodes.numberNode(l.longValue)
    case d: java.lang.Double  => nodes.numberNode(d.doubleValue)
    case f: java.lang.Float   => nodes.numberNode(f.floatValue)
    case s: java.lang.Short   => nodes.numberNode(s.shortValue)
    case b: java.lang.Byte    => nodes.numberNode(b.byteValue)
    case b: java.lang.Boolean => nodes.booleanNode(b.booleanValue)
    case d: org.apache.spark.sql.types.Decimal =>
      nodes.numberNode(d.toJavaBigDecimal)
    case other => nodes.textNode(other.toString)
  }

  /** Core modifier; returns the compactly re-serialized document. */
  def modify(json: String, path: String, value: Any, raw: Boolean): String = {
    val (appendMode, rest) =
      if (path.startsWith("append ")) (true, path.stripPrefix("append ").trim)
      else (false, path)
    val (strict, segs) =
      JsonValue.pathCache.computeIfAbsent(rest, JsonValue.parsePath _)
    val root: JsonNode =
      try mapper.readTree(json)
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"JSON text is not properly formatted: ${e.getMessage}") }

    def walk(from: JsonNode, ss: Array[JsonValue.Seg]): JsonNode = {
      var node = from; var i = 0
      while (i < ss.length && node != null) {
        node = ss(i) match {
          case JsonValue.Member(n) => if (node.isObject) node.get(n) else null
          case JsonValue.Index(n)  => if (node.isArray) node.get(n) else null
        }
        i += 1
      }
      node
    }

    if (appendMode) {
      walk(root, segs) match {
        case a: ArrayNode => a.add(toNode(value, raw))
        case null =>
          if (strict) err(s"(strict) array cannot be found at path '$path'")
          else if (segs.isEmpty) err("cannot create an array at '$'")
          else (walk(root, segs.init), segs.last) match {
            // lax creates a fresh one-element array on an existing
            // object parent; anything else is loud
            case (o: ObjectNode, JsonValue.Member(n)) =>
              val a = nodes.arrayNode(); a.add(toNode(value, raw)); o.set(n, a); ()
            case _ => err(s"cannot create an array at path '$path'")
          }
        case _ => err(s"array cannot be found at path '$path'")
      }
    } else {
      if (segs.isEmpty) err("cannot modify the root '$' — replace the column instead")
      val parent = walk(root, segs.init)
      val deleting = value == null
      (parent, segs.last) match {
        case (o: ObjectNode, JsonValue.Member(n)) =>
          val exists = o.has(n)
          if (deleting) {
            if (exists) { if (strict) o.set(n, nodes.nullNode) else o.remove(n); () }
            else if (strict) err(s"(strict) property does not exist at path '$path'")
            // lax delete of a missing member: no-op
          } else {
            if (!exists && strict)
              err(s"(strict) property does not exist at path '$path'")
            o.set(n, toNode(value, raw)); ()
          }
        case (a: ArrayNode, JsonValue.Index(i)) =>
          if (i < a.size) {
            if (deleting) { if (strict) a.set(i, nodes.nullNode) else a.remove(i); () }
            else { a.set(i, toNode(value, raw)); () }
          } else {
            if (strict) err(s"(strict) array index out of range at path '$path'")
            else if (!deleting) { a.add(toNode(value, raw)); () }
            // lax delete of a missing element: no-op
          }
        case _ =>
          err(s"cannot insert on path '$path' (parent is missing, a scalar, or the wrong container kind)")
      }
    }
    root.toString
  }

  def applyU(json: UTF8String, path: UTF8String, value: Any,
      raw: Boolean): UTF8String = {
    val r = modify(json.toString, path.toString, value, raw)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Idempotent — see SimHash64.register. The raw-fragment flag is
    * resolved structurally: a `json_query(...)` in value position
    * injects its fragment unescaped, exactly T-SQL's provenance rule. */
  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("json_modify")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "json_modify",
        exprs => JsonModify(exprs(0), exprs(1), exprs(2),
          raw = exprs(2).isInstanceOf[JsonQuery]),
        "built-in")
}
