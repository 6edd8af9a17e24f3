package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Scalar function families (SURVEY.md §2.7). The reference's core
  * expression is `JSON_VALUE(line,'$.after."x"') + CAST`
  * (/root/reference/README.md:178-179) — q54 reproduces it against
  * `events.props`; the rest cover the string/date/math/array/map/
  * struct surface of the invoked T-SQL engine (origin I).
  *
  * All pure `functions._` built-ins → whole-stage-codegen'd,
  * map-side-only (zero shuffles except the final ORDER BY exchange).
  * DuckDB dialect traps handled per SURVEY §2.0-⑥: bigint-returning
  * length/year/datediff cast to int on the oracle side, 1-indexed
  * lists, regexp_replace needs the 'g' flag, floor/ceil stay double
  * in DuckDB (cast both to bigint).
  */
object ScalarQueries {

  /** q50: string function family. */
  private def q50(s: SparkSession, d: String): DataFrame =
    spread(s, part(s, d)).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_brand")).as("lo"),
      length(col("p_name")).as("len"),
      trim(col("p_name")).as("tr"),
      substring(col("p_name"), 1, 10).as("sub"),
      concat_ws("#", col("p_brand"), col("p_type")).as("cc"),
      lpad(col("p_brand"), 12, "*").as("lp"),
      reverse(col("p_brand")).as("rev"),
      regexp_replace(col("p_type"), " ", "_").as("repl"),
      expr("left(p_type, 3)").as("l3"),
      expr("right(p_type, 2)").as("r2"))
      .transform(Det.emitWide(_, "p_partkey"))

  /** q51: regex + predicate string functions (booleans cast to int for
    * cross-engine hash stability). */
  private def q51(s: SparkSession, d: String): DataFrame =
    spread(s, part(s, d)).select(
      col("p_partkey"),
      regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
      regexp_replace(col("p_name"), "[aeiou]", "*").as("starred"),
      col("p_type").like("%a%").cast("int").as("has_a"),
      col("p_name").contains("b").cast("int").as("has_b"),
      col("p_brand").startsWith("B1").cast("int").as("is_b1"))
      .transform(Det.emitWide(_, "p_partkey"))

  /** q101: PII-style redaction — the scrub pass a pipeline runs before
    * landing data in a shared lake: digit runs replaced by a sentinel,
    * a bounded visible suffix retained, and a digit count kept for
    * audit. Pure map-side regex expressions (codegen'd); patterns stay
    * lookahead-free so the Java-regex and RE2 oracles agree. */
  private def q101(s: SparkSession, d: String): DataFrame =
    spread(s, customer(s, d)).select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("name_redacted"),
      regexp_extract(col("c_name"), "([0-9]{3})$", 1).as("last3"),
      length(regexp_replace(col("c_name"), "[^0-9]", "")).as("n_digits"))
      .transform(Det.emitWide(_, "c_custkey"))

  /** q52: date/time function family (dates emitted as ISO strings —
    * parquet date32 vs DuckDB DATE pandas round-trips diverge). */
  private def q52(s: SparkSession, d: String): DataFrame =
    spread(s, orders(s, d)).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dy"),
      date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("mstart"),
      date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus30"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("dd"),
      last_day(col("o_orderdate")).cast("string").as("ld"))
      .transform(Det.emitWide(_, "o_orderkey"))

  /** q53: math function family; transcendentals rounded to 6dp (libm
    * last-ulp differences between JVM and C++). */
  private def q53(s: SparkSession, d: String): DataFrame =
    spread(s, orders(s, d)).select(
      col("o_orderkey"),
      round(abs(col("o_totalprice") - 200000.0), 2).as("ab"),
      floor(col("o_totalprice")).cast("long").as("fl"),
      ceil(col("o_totalprice")).cast("long").as("ce"),
      round(pow(lit(2.0), col("o_orderkey") % 10), 6).as("pw"),
      // sqrt/log/exp route through libm (java.lang.Math here, C libm
      // in DuckDB) and can differ in the last ulp — epsilon-shift
      // before rounding (Det doctrine) so a boundary-adjacent value
      // can't round differently across engines; `ab`/`pw` stay plain
      // round: 2dp-money arithmetic and integer powers of two are
      // grid-exact
      Det.r6e(sqrt(col("o_totalprice"))).as("sq"),
      Det.r6e(log(col("o_totalprice"))).as("ln_"),
      Det.r6e(log10(col("o_totalprice"))).as("l10"),
      Det.r6e(exp(col("o_totalprice") / 100000.0)).as("ex"),
      (col("o_orderkey") % 7).as("md_"),
      signum(col("o_totalprice") - 200000.0).cast("int").as("sg"))
      .transform(Det.emitWide(_, "o_orderkey"))

  /** q54: the reference's core expression — JSON path extraction +
    * cast + aggregate (README.md:178-179) over `events.props`.
    * `get_json_object` = schema-less JSON_VALUE twin. */
  private def q54(s: SparkSession, d: String): DataFrame =
    spread(s, events(s, d))
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        Det.r4e(avg("k")).as("avg_k"))
      .orderBy("event_type")

  /** q146: T-SQL JSON_VALUE/ISJSON exact semantics over a corrupted
    * scan — every row whose event_id is a multiple of 10 has its
    * leading `{` stripped (deterministically malformed). The guarded
    * extraction is EXACTLY how a T-SQL user writes it
    * (`CASE WHEN ISJSON(c)=1 THEN JSON_VALUE(c, '$.k') END`), plus
    * the quoted-member path of the reference's own query
    * (`$."k"` — README.md:178's `$.after."city"` shape), a lax
    * missing-member NULL, and the scalar-only rule (the root object
    * extracts as NULL, where get_json_object would return the raw
    * JSON text). All map-side codegen'd expressions; the oracle is
    * the DuckDB translation with json_valid/json_type guards. */
  private def q146(s: SparkSession, d: String): DataFrame = {
    graft.functions.JsonValue.register(s)
    graft.functions.IsJson.register(s)
    spread(s, events(s, d))
      .withColumn("c", when(col("event_id") % 10 === 0,
        expr("substr(props, 2)")).otherwise(col("props")))
      .select(col("event_id"),
        expr("is_json(c)").as("ok"),
        when(expr("is_json(c)") === 1, expr("json_value(c, '$.k')"))
          .otherwise(lit(null).cast("string")).as("k"),
        expr("""json_value(props, '$."k"')""").as("kq"),
        expr("json_value(props, 'lax $.device')").as("missing"),
        expr("json_value(props, '$')").as("whole"))
      .transform(Det.emitWide(_, "event_id"))
  }

  /** Compact nested-JSON fixture shared by q155/q156 — built from
    * event columns with plain string concat, so the ORACLE can derive
    * every expected output directly from the same columns (no
    * dependence on the other engine's JSON normalization). Compact
    * (no whitespace) on purpose: JSON_QUERY re-serializes fragments
    * compactly, so fragments round-trip byte-identically. Shape:
    * `{"x":<k>,"y":"<type>","z":null,"b":true,"arr":[<k>,"t"],"o":{"u":1}}`
    * — one member per OPENJSON type code. */
  private def nestedJson: Column =
    concat(
      lit("{\"x\":"), get_json_object(col("props"), "$.k"),
      lit(",\"y\":\""), col("event_type"),
      lit("\",\"z\":null,\"b\":true,\"arr\":["),
      get_json_object(col("props"), "$.k"),
      lit(",\"t\"],\"o\":{\"u\":1}}"))

  /** q155: T-SQL JSON_QUERY — the fragment-returning sibling of
    * JSON_VALUE (q146), closing the surface split: objects/arrays
    * come back as JSON text (where JSON_VALUE yields NULL), scalars
    * yield lax-NULL (where JSON_VALUE extracts). The oracle
    * reconstructs every fragment from the SAME base columns the JSON
    * was built from — ground truth independent of any JSON engine.
    * All map-side codegen'd; zero shuffles before the emit. */
  private def q155(s: SparkSession, d: String): DataFrame = {
    graft.functions.JsonQuery.register(s)
    spread(s, events(s, d))
      .withColumn("j", nestedJson)
      .select(col("event_id"),
        expr("json_query(j, '$.o')").as("frag_obj"),
        expr("json_query(j, '$.arr')").as("frag_arr"),
        expr("json_query(j, 'lax $.y')").as("scalar_lax"),
        expr("json_query(j, '$.nope')").as("missing"),
        expr("json_query(j, '$')").as("whole"))
      .transform(Det.emitWide(_, "event_id"))
  }

  /** q156: T-SQL OPENJSON default schema — shred the object to
    * (key, value, type) rows: the parse is one codegen'd scalar call
    * (`openjson_entries`), the fan-out is Spark's own posexplode (a
    * native generator — no shuffle). Covers all six T-SQL type codes
    * (null/string/number/bool/array/object) and the unquoted-string
    * value rule. Oracle = the same rows constructed directly from the
    * base columns via UNION ALL. */
  private def q156(s: SparkSession, d: String): DataFrame = {
    graft.functions.OpenJsonEntries.register(s)
    spread(s, events(s, d))
      .withColumn("j", nestedJson)
      .select(col("event_id"),
        posexplode(expr("openjson_entries(j, '$')")))
      .select(col("event_id"), col("pos"),
        col("col.key").as("k"), col("col.value").as("v"),
        col("col.type").as("t"))
      .transform(Det.emitWide(_, "event_id", "pos"))
  }

  /** q164: T-SQL JSON_MODIFY — the WRITE-path member completing the
    * JSON family (q146 scalars / q155 fragments / q156 shredding are
    * the read side). One document walks the full edit surface: replace
    * a member in place, delete by SQL NULL, `append` onto an array,
    * lax out-of-range index append, replace an array element with a
    * NUMBER, inject a RAW fragment via the json_query provenance rule,
    * and insert a brand-new member (lands at the object's end). Every
    * edit is a map-side codegen'd expression; the oracle reconstructs
    * each expected document byte-for-byte from the same base columns
    * the fixture was built from — ground truth independent of any
    * JSON engine (the q155 discipline). Error/strict branches are
    * spec-pinned in OperatorSpec, not here. */
  private def q164(s: SparkSession, d: String): DataFrame = {
    graft.functions.JsonModify.register(s)
    graft.functions.JsonQuery.register(s)
    spread(s, events(s, d))
      .withColumn("j", nestedJson)
      .withColumn("m1", expr("json_modify(j, '$.y', upper(event_type))"))
      .withColumn("m2", expr("json_modify(m1, '$.z', CAST(NULL AS STRING))"))
      .withColumn("m3", expr("json_modify(m2, 'append $.arr', 'end')"))
      .withColumn("m4", expr("json_modify(m3, '$.arr[0]', 7)"))
      .withColumn("m5",
        expr("""json_modify(m4, '$.o', json_query('{"v":2}', '$'))"""))
      .withColumn("m6", expr("json_modify(m5, '$.w', 'nw')"))
      .select(col("event_id"),
        col("m2").as("after_delete"),
        col("m4").as("after_array"),
        col("m6").as("final_doc"))
      .transform(Det.emitWide(_, "event_id"))
  }

  /** q167: T-SQL OPENJSON WITH — the TYPED projection form (q156 is
    * the default-schema shred): each WITH-clause column binds a path
    * to a declared type, scalars through JSON_VALUE, `AS JSON`
    * fragments through JSON_QUERY, then a CAST — including a nested
    * path, a missing member (lax NULL), and a bit-style boolean
    * surfaced as 0/1. Pure composition of the family's codegen'd
    * expressions: one map-side pass, no generator. Oracle rebuilds
    * every typed value from the base columns. */
  private def q167(s: SparkSession, d: String): DataFrame = {
    import graft.functions.OpenJsonWith.{shred, Spec}
    val withJson = spread(s, events(s, d)).withColumn("j", nestedJson)
    shred(s, withJson, "j", Seq(
      Spec("x", "$.x", "int"),
      Spec("y", "$.y", "string"),
      Spec("b", "$.b", "boolean"),
      Spec("nope", "$.nope", "string"),
      Spec("u", "$.o.u", "int"),
      Spec("frag", "$.o", "string", asJson = true)))
      .select(col("event_id"), col("x"), col("y"),
        col("b").cast("int").as("b01"), col("nope"), col("u"), col("frag"))
      .transform(Det.emitWide(_, "event_id"))
  }

  /** q249: TRY_CAST / TRY_CONVERT — the error-tolerant scalar surface
    * (round 14 — VERDICT r13 item 4). T-SQL's TRY_CAST family is the
    * standard tool against malformed CDC payloads (origin I, same
    * README.md:156-192 anchor as q54): a cast that yields NULL on a
    * malformed VALUE instead of failing the batch — the value-level
    * twin of the s13/s29 malformed-LINE quarantine. Garbage is
    * PLANTED deterministically from the props field's own `k`
    * (per-type mixes, because engines legitimately diverge on
    * cross-type casts — DuckDB rounds '6.55' to INT 7 where ANSI
    * refuses, and bare year-strings parse as dates in Spark but not
    * DuckDB; TRY semantics are about malformed values, not dialect
    * corners, so the planted mix stays inside the shared contract):
    * ints get whitespace/empty/prefixed-garbage, doubles get exact
    * digit-built decimal and scientific strings plus unit suffixes,
    * dates get real ISO days, impossible calendar days (Feb 30,
    * month 13) and free text. Pure map-side codegen'd expressions
    * (Spark's native `try_cast` — ANSI cast semantics, NULL on
    * failure, never throws); oracle is DuckDB `TRY_CAST` verbatim. */
  private def q249(s: SparkSession, d: String): DataFrame = {
    graft.functions.JsonValue.register(s)
    spread(s, events(s, d))
      .select(col("event_id"),
        expr("""json_value(props, '$."k"')""").as("k"),
        col("ts"))
      .select(col("event_id"),
        expr("""CASE CAST(event_id % 4 AS INT)
                  WHEN 0 THEN k
                  WHEN 1 THEN concat('x', k)
                  WHEN 2 THEN concat(' ', k, ' ')
                  ELSE '' END""").as("raw_int"),
        expr("""CASE CAST(event_id % 4 AS INT)
                  WHEN 0 THEN concat(k, '.', lpad(CAST(event_id % 100 AS STRING), 2, '0'))
                  WHEN 1 THEN concat(k, ' units')
                  WHEN 2 THEN concat('1e', CAST(event_id % 5 AS STRING))
                  ELSE concat('-', k) END""").as("raw_double"),
        expr("""CASE CAST(event_id % 4 AS INT)
                  WHEN 0 THEN CAST(CAST(ts AS DATE) AS STRING)
                  WHEN 1 THEN '2024-02-30'
                  WHEN 2 THEN concat('2024-13-', lpad(CAST(event_id % 28 + 1 AS STRING), 2, '0'))
                  ELSE concat('day ', k) END""").as("raw_date"))
      .select(col("event_id"),
        col("raw_int"), col("raw_double"), col("raw_date"),
        expr("try_cast(raw_int AS INT)").as("as_int"),
        expr("try_cast(raw_double AS DOUBLE)").as("as_double"),
        // the DATE result re-emits as its ISO string: a NULLABLE date
        // column round-trips through the harness's pandas compare as
        // mixed object cells (date + None) and false-mismatches
        // against DuckDB's NaT — the TRY semantics (NULL on Feb 30 /
        // month 13 / free text) are identical either way
        expr("CAST(try_cast(raw_date AS DATE) AS STRING)").as("as_date"))
      .transform(Det.emitWide(_, "event_id"))
  }

  /** q55: array functions over the 64-dim embedding column. Element
    * arithmetic is cast to double BEFORE any op so both engines do
    * identical double arithmetic (floats stay bitwise-comparable). */
  private def q55(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(element_at(col("embedding"), 1).cast("double"), 4).as("first"),
      round(
        element_at(col("embedding"), 1).cast("double") +
        element_at(col("embedding"), 2).cast("double") +
        element_at(col("embedding"), 3).cast("double"), 4).as("s3"),
      array_contains(array(lit(0), lit(1)), col("label")).cast("int").as("lab01"))
      .orderBy("vec_id")

  /** q56: lateral explode with position → re-aggregate per position.
    * posexplode keys the fan-out by (vec_id,pos) so the following
    * aggregate shuffles on pos — bounded state (64 groups) at any SF. */
  private def q56(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), Det.r6e(avg(col("v").cast("double"))).as("avg_v"))
      .orderBy("pos")

  /** q57: map construction + element_at lookup, output flattened. */
  private def q57(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("tot"))
      .withColumn("m", map(lit("n"), col("cnt").cast("double"), lit("tot"), col("tot")))
      .select(col("status"),
        element_at(col("m"), "n").as("n"),
        element_at(col("m"), "tot").as("total"),
        size(map_keys(col("m"))).as("nkeys"))
      .orderBy("status")

  /** q58: struct build → to_json → from_json round-trip (the envelope
    * mechanics of §2.8 in isolation), output re-flattened. */
  private def q58(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("st", StringType),
      StructField("p", StringType)))
    spread(s, orders(s, d))
      .select(to_json(struct(
        col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        round(col("o_totalprice"), 2).cast("string").as("p"))).as("j"))
      .select(from_json(col("j"), schema).as("s"))
      .select(col("s.k").as("k"), col("s.st").as("st"),
        col("s.p").cast("double").as("p"))
      .transform(Det.emitWide(_, "k"))
  }

  /** q98: the UDAF surface — weighted mean Σ(w·x)/Σ(w) as a typed
    * `Aggregator` registered via `functions.udaf` (see
    * graft.functions.WeightedMean). Runs as a partial+final hash
    * aggregate exactly like a built-in. */
  private def q98(s: SparkSession, d: String): DataFrame = {
    graft.functions.WeightedMean.register(s)
    orders(s, d)
      .withColumn("w", (col("o_orderkey") % 10 + 1).cast("double"))
      .groupBy("o_orderpriority")
      .agg(Det.r4e(expr("wmean(o_totalprice, w)")).as("wavg_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_str_funcs" -> q50, "q51_str_regex" -> q51, "q52_date_funcs" -> q52,
    "q53_math_funcs" -> q53, "q54_json_extract" -> q54,
    "q55_array_funcs" -> q55, "q56_explode_unnest" -> q56,
    "q57_map_funcs" -> q57, "q58_struct_nested" -> q58,
    "q98_udaf_weighted_mean" -> q98, "q101_redact" -> q101,
    "q146_json_value" -> q146,
    "q155_json_query" -> q155, "q156_openjson_shred" -> q156,
    "q164_json_modify" -> q164, "q167_openjson_with" -> q167,
    "q249_try_cast" -> q249)

  val oracles: Map[String, String] = Map(
    "q50_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
                CAST(length(p_name) AS INT) AS len, trim(p_name) AS tr,
                substr(p_name, 1, 10) AS sub,
                p_brand || '#' || p_type AS cc,
                lpad(p_brand, 12, '*') AS lp, reverse(p_brand) AS rev,
                regexp_replace(p_type, ' ', '_', 'g') AS repl,
                left(p_type, 3) AS l3, right(p_type, 2) AS r2
         FROM part ORDER BY p_partkey""",
    "q51_str_regex" ->
      """SELECT p_partkey,
                regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
                regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
                CAST(p_type LIKE '%a%' AS INT) AS has_a,
                CAST(contains(p_name, 'b') AS INT) AS has_b,
                CAST(starts_with(p_brand, 'B1') AS INT) AS is_b1
         FROM part ORDER BY p_partkey""",
    "q52_date_funcs" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS yr,
                CAST(month(o_orderdate) AS INT) AS mo,
                CAST(day(o_orderdate) AS INT) AS dy,
                CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS mstart,
                CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
                CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS dd,
                CAST(last_day(o_orderdate) AS VARCHAR) AS ld
         FROM orders ORDER BY o_orderkey""",
    "q53_math_funcs" ->
      """SELECT o_orderkey,
                round(abs(o_totalprice - 200000.0), 2) AS ab,
                CAST(floor(o_totalprice) AS BIGINT) AS fl,
                CAST(ceil(o_totalprice) AS BIGINT) AS ce,
                round(pow(2.0, o_orderkey % 10), 6) AS pw,
                round(sqrt(o_totalprice) + 0.0000000123, 6) AS sq,
                round(ln(o_totalprice) + 0.0000000123, 6) AS ln_,
                round(log10(o_totalprice) + 0.0000000123, 6) AS l10,
                round(exp(o_totalprice / 100000.0) + 0.0000000123, 6) AS ex,
                o_orderkey % 7 AS md_,
                CAST(sign(o_totalprice - 200000.0) AS INT) AS sg
         FROM orders ORDER BY o_orderkey""",
    "q54_json_extract" ->
      """SELECT event_type, CAST(count(1) AS BIGINT) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k) + 0.00000123, 4) AS avg_k
         FROM (SELECT event_type,
                      CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
               FROM events)
         GROUP BY event_type ORDER BY event_type""",
    "q146_json_value" ->
      """SELECT event_id,
                CAST(CASE WHEN json_valid(c)
                            AND substr(ltrim(c), 1, 1) IN ('{', '[')
                          THEN 1 ELSE 0 END AS INT) AS ok,
                CASE WHEN json_valid(c)
                       AND substr(ltrim(c), 1, 1) IN ('{', '[')
                     THEN json_extract_string(c, '$.k') END AS k,
                json_extract_string(props, '$.k') AS kq,
                json_extract_string(props, '$.device') AS missing,
                CASE WHEN json_type(props) NOT IN ('OBJECT', 'ARRAY')
                     THEN json_extract_string(props, '$') END AS whole
         FROM (SELECT event_id, props,
                      CASE WHEN event_id % 10 = 0
                           THEN substr(props, 2) ELSE props END AS c
               FROM events)
         ORDER BY event_id""",
    // q155/q156 oracles reconstruct the expected output DIRECTLY from
    // the base columns the JSON fixture was built from — ground truth
    // with zero dependence on DuckDB's own JSON normalization.
    "q155_json_query" ->
      """SELECT event_id,
                '{"u":1}' AS frag_obj,
                '[' || k || ',"t"]' AS frag_arr,
                CAST(NULL AS VARCHAR) AS scalar_lax,
                CAST(NULL AS VARCHAR) AS missing,
                '{"x":' || k || ',"y":"' || et || '","z":null,"b":true,"arr":['
                  || k || ',"t"],"o":{"u":1}}' AS whole
         FROM (SELECT event_id, event_type AS et,
                      json_extract_string(props, '$.k') AS k
               FROM events)
         ORDER BY event_id""",
    "q156_openjson_shred" ->
      """WITH base AS (SELECT event_id, event_type AS et,
                             json_extract_string(props, '$.k') AS kk
                      FROM events)
         SELECT event_id, CAST(pos AS INT) AS pos, k, v, CAST(t AS INT) AS t
         FROM (
           SELECT event_id, 0 AS pos, 'x' AS k, kk AS v, 2 AS t FROM base
           UNION ALL SELECT event_id, 1, 'y', et, 1 FROM base
           UNION ALL SELECT event_id, 2, 'z', NULL, 0 FROM base
           UNION ALL SELECT event_id, 3, 'b', 'true', 3 FROM base
           UNION ALL SELECT event_id, 4, 'arr', '[' || kk || ',"t"]', 4 FROM base
           UNION ALL SELECT event_id, 5, 'o', '{"u":1}', 5 FROM base)
         ORDER BY event_id, pos""",
    // q164: expected documents reconstructed from the base columns —
    // the edits' exact byte output (compact serialization, in-place
    // replace keeps position, inserts land at the end, deletes drop
    // the member) is the contract under test.
    "q164_json_modify" ->
      """SELECT event_id,
                '{"x":' || k || ',"y":"' || et || '","b":true,"arr":['
                  || k || ',"t"],"o":{"u":1}}' AS after_delete,
                '{"x":' || k || ',"y":"' || et || '","b":true,"arr":[7,"t","end"],"o":{"u":1}}'
                  AS after_array,
                '{"x":' || k || ',"y":"' || et || '","b":true,"arr":[7,"t","end"],"o":{"v":2},"w":"nw"}'
                  AS final_doc
         FROM (SELECT event_id, upper(event_type) AS et,
                      json_extract_string(props, '$.k') AS k
               FROM events)
         ORDER BY event_id""",
    "q167_openjson_with" ->
      """SELECT event_id,
                CAST(k AS INT) AS x,
                et AS y,
                1 AS b01,
                CAST(NULL AS VARCHAR) AS nope,
                1 AS u,
                '{"u":1}' AS frag
         FROM (SELECT event_id, event_type AS et,
                      json_extract_string(props, '$.k') AS k
               FROM events)
         ORDER BY event_id""",
    // q249: DuckDB TRY_CAST verbatim over the identically-planted
    // per-type garbage mixes (see the Spark side for why the mixes
    // are per-type: cross-type dialect corners like '6.55'→INT are
    // deliberately excluded from the TRY contract)
    "q249_try_cast" ->
      """WITH b AS (SELECT event_id,
                           json_extract_string(props, 'k') AS k,
                           CAST(CAST(ts AS DATE) AS VARCHAR) AS day
                    FROM events),
          r AS (SELECT event_id,
                  CASE CAST(event_id % 4 AS INT)
                    WHEN 0 THEN k
                    WHEN 1 THEN 'x' || k
                    WHEN 2 THEN ' ' || k || ' '
                    ELSE '' END AS raw_int,
                  CASE CAST(event_id % 4 AS INT)
                    WHEN 0 THEN k || '.' ||
                                lpad(CAST(event_id % 100 AS VARCHAR), 2, '0')
                    WHEN 1 THEN k || ' units'
                    WHEN 2 THEN '1e' || CAST(event_id % 5 AS VARCHAR)
                    ELSE '-' || k END AS raw_double,
                  CASE CAST(event_id % 4 AS INT)
                    WHEN 0 THEN day
                    WHEN 1 THEN '2024-02-30'
                    WHEN 2 THEN '2024-13-' ||
                                lpad(CAST(event_id % 28 + 1 AS VARCHAR), 2, '0')
                    ELSE 'day ' || k END AS raw_date
                FROM b)
          SELECT event_id, raw_int, raw_double, raw_date,
                 TRY_CAST(raw_int AS INTEGER) AS as_int,
                 TRY_CAST(raw_double AS DOUBLE) AS as_double,
                 CAST(TRY_CAST(raw_date AS DATE) AS VARCHAR) AS as_date
          FROM r ORDER BY event_id""",
    "q55_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
                round(CAST(embedding[1] AS DOUBLE), 4) AS first,
                round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                      + CAST(embedding[3] AS DOUBLE), 4) AS s3,
                CAST(list_contains([0, 1], label) AS INT) AS lab01
         FROM embeddings ORDER BY vec_id""",
    "q56_explode_unnest" ->
      """SELECT pos, CAST(count(1) AS BIGINT) AS n, round(avg(v) + 0.0000000123, 6) AS avg_v
         FROM (SELECT CAST(unnest(range(len(embedding))) AS INT) AS pos,
                      unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
               FROM embeddings)
         GROUP BY pos ORDER BY pos""",
    "q57_map_funcs" ->
      """SELECT o_orderstatus AS status,
                CAST(count(1) AS DOUBLE) AS n,
                round(sum(o_totalprice), 2) AS total,
                2 AS nkeys
         FROM orders GROUP BY o_orderstatus ORDER BY status""",
    "q58_struct_nested" ->
      """SELECT o_orderkey AS k, o_orderstatus AS st,
                round(o_totalprice, 2) AS p
         FROM orders ORDER BY k""",
    "q98_udaf_weighted_mean" ->
      """SELECT o_orderpriority,
                round(sum(o_totalprice * (o_orderkey % 10 + 1))
                      / sum(o_orderkey % 10 + 1) + 0.00000123, 4) AS wavg_price,
                CAST(count(1) AS BIGINT) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q101_redact" ->
      """SELECT c_custkey,
                regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS name_redacted,
                regexp_extract(c_name, '([0-9]{3})$', 1) AS last3,
                CAST(strlen(regexp_replace(c_name, '[^0-9]', '', 'g')) AS INT)
                  AS n_digits
         FROM customer ORDER BY c_custkey""")
}
