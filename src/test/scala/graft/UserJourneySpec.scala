package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.examples.UserJourney
import graft.operators.{Funnel, Sessionize}

/** Pipeline invariants for the composed journey-feature run. */
class UserJourneySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  lazy val events = Tables.events(spark, sf)
  lazy val feats = UserJourney.run(events).cache()

  test("one row per user; event counts conserved") {
    val users = events.select("user_id").distinct().count()
    assert(feats.count() == users)
    val total = feats.agg(sum("n_events")).head().getLong(0)
    assert(total == events.count(), "events lost or duplicated in rollup")
  }

  test("n_sessions equals the sessionizer's max id per user") {
    val e = events.withColumn("tsec", date_trunc("second", col("ts")))
    val want = Sessionize
      .assign(e, "user_id", "tsec", 1800L, orderCols = Seq("event_id"))
      .groupBy("user_id").agg(max("sess").as("m"))
    val bad = feats.join(want, "user_id")
      .where(col("n_sessions") =!= col("m"))
    assert(bad.isEmpty, "session rollup disagrees with session ids")
  }

  test("converted agrees with the standalone funnel; never null") {
    val e = events.withColumn("tsec", date_trunc("second", col("ts")))
    val conv = Funnel.strictOrder(e, "user_id", "event_type", "tsec",
      Seq("view", "click", "purchase"))
    val joined = feats.join(
      conv.select(col("user_id"), col("converted").as("want")),
      Seq("user_id"), "left")
    assert(joined.where(col("converted").isNull).isEmpty)
    assert(joined
      .where(coalesce(col("want"), lit(0)) =!= col("converted")).isEmpty,
      "conversion flags disagree with the funnel operator")
    // the fixture actually converts some users (non-vacuous)
    assert(feats.where(col("converted") === 1).count() > 0)
  }

  test("funnel operator rejects bad stage lists") {
    val e = events.limit(1)
    intercept[IllegalArgumentException] {
      Funnel.strictOrder(e, "user_id", "event_type", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.strictOrder(e, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }
  }

  test("registerCatalog: the reference's ad-hoc SQL workflow runs verbatim-shaped against registered views") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ONE call: fixture tables as views + the SQL function family
    val views = graft.sources.Lake.registerCatalog(spark,
      fixturesDir = Some(sf))
    assert(Set("orders", "customer", "lineitem", "events", "documents")
      .subsetOf(views.toSet), s"registered: $views")
    // the reference's revenue query SHAPE (README.md:173-192):
    // JSON_VALUE with a QUOTED member path, extract + cast + SUM +
    // GROUP BY — typed as pure SQL, no Scala builder. The envelope
    // CTE stands in for the at-rest NDJSON the reference globs.
    val sql = spark.sql(
      """WITH lines AS (
           SELECT to_json(named_struct(
             'after', named_struct(
               'id', o.o_orderkey,
               'city', c.c_mktsegment,
               'revenue', cast(round(o.o_totalprice, 2) as string))))
             AS line
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
         SELECT json_value(line, '$.after."city"') AS city,
                count(1) AS n_rides,
                round(sum(cast(
                  json_value(line, '$.after."revenue"') AS double)), 2)
                  AS total_revenue
         FROM lines
         GROUP BY json_value(line, '$.after."city"')
         ORDER BY city""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // oracle-matched: q60 is the same computation through the
    // DataFrame path, and q60 itself is DuckDB-hash-checked every run
    val q60 = SparkEntry.queries("q60_cdc_envelope_roundtrip")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(sql.toSeq == q60.toSeq, s"SQL path diverged from q60")
    // lake + store + publish-set views: snapshot-resolved, pinned
    val base = TestSpark.tmpDir("catalog-sql")
    val day = "2022-12-12"
    graft.sources.Lake.writePartitioned(
      spark.range(0, 50).select(col("id"),
        lit(day).cast("timestamp").as("ts")), "ts", s"$base/lake")
    def merge(store: String, i: Long): Unit =
      graft.sources.Lake.mergeInto(spark, s"$base/$store",
        Seq((1L, s"v$i", i, false)).toDF("k", "v", "ver", "is_delete"),
        Seq("k"), Seq("ver"), Some(col("is_delete")))
    merge("idx", 1L); merge("doclen", 1L)
    val pubDir = new org.apache.hadoop.fs.Path(s"$base/pub")
    val fs = pubDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.PublishSet.publish(fs,
      spark.sparkContext.hadoopConfiguration, pubDir,
      Map("idx" -> 1L, "doclen" -> 1L))
    graft.sources.Lake.registerCatalog(spark,
      lakes = Map("rides_lake" -> s"$base/lake"),
      stores = Map("idx_now" -> s"$base/idx"),
      publishSets = Map("rag" -> ((s"$base/pub",
        (m: String) => s"$base/$m"))))
    // the day-glob analogue: partition-pruned SQL over the lake view
    assert(spark.sql(
      s"SELECT count(1) FROM rides_lake WHERE ingest_date = '$day'")
      .head().getLong(0) == 50L)
    // a member refresh AFTER registration moves neither the pinned
    // publish-set view nor the registered current-store view (temp
    // views hold their resolved snapshot — the documented contract)
    merge("idx", 2L)
    assert(spark.sql("SELECT v FROM rag_idx").head().getString(0) == "v1",
      "publish-set view drifted off its pinned version")
    assert(spark.sql("SELECT v FROM idx_now").head().getString(0) == "v1",
      "registered store view moved mid-session")
    // re-registration advances — the explicit catalog refresh
    graft.sources.Lake.registerCatalog(spark,
      stores = Map("idx_now" -> s"$base/idx"))
    assert(spark.sql("SELECT v FROM idx_now").head().getString(0) == "v2")
  }

  test("SQL time travel: registered _v<K>/_tag_<t> views pin versions, byte-stable under later commits; refreshCatalog advances narrowly") {
    import spark.implicits._
    val base = TestSpark.tmpDir("catalog-tt")
    val conf = spark.sparkContext.hadoopConfiguration
    def merge(store: String, k: Long, i: Long): Unit =
      graft.sources.Lake.mergeInto(spark, s"$base/$store",
        Seq((k, s"v$i", i, false)).toDF("k", "v", "ver", "is_delete"),
        Seq("k"), Seq("ver"), Some(col("is_delete")))
    merge("corpus", 1L, 1L) // v1
    merge("corpus", 1L, 2L) // v2 (v1 retained: keep = 2)
    val cp = new org.apache.hadoop.fs.Path(s"$base/corpus")
    val fs = cp.getFileSystem(conf)
    graft.sources.Snapshot.tag(fs, conf, cp, "run-1", 1L)
    merge("other", 9L, 1L)
    val views = graft.sources.Lake.registerCatalog(spark,
      stores = Map("corpus" -> s"$base/corpus",
        "other" -> s"$base/other"))
    assert(Set("corpus", "corpus_v1", "corpus_v2", "corpus_tag_run_1")
      .subsetOf(views.toSet), s"registered: $views")
    // the pinned SQL read ≡ the Scala readStoreAt read
    def one(sql: String) = spark.sql(sql).head().getString(0)
    assert(one("SELECT v FROM corpus_v1") == "v1")
    assert(one("SELECT v FROM corpus_v2") == "v2")
    assert(one("SELECT v FROM corpus_tag_run_1") == "v1")
    assert(graft.sources.Lake.readStoreAt(spark, s"$base/corpus", 1L)
      .head().getAs[String]("v") == "v1")
    // a LATER commit moves nothing already registered — byte-stable
    merge("corpus", 1L, 3L) // v3
    assert(one("SELECT v FROM corpus") == "v2",
      "current-store view moved mid-session")
    assert(one("SELECT v FROM corpus_v2") == "v2")
    assert(one("SELECT v FROM corpus_tag_run_1") == "v1")
    // NARROW refresh: corpus advances (and its time-travel views
    // re-enumerate), `other` stays pinned
    merge("other", 9L, 2L)
    val refreshed = graft.sources.Lake.refreshCatalog(spark, Seq("corpus"))
    assert(refreshed.contains("corpus_v3"), s"refreshed: $refreshed")
    assert(one("SELECT v FROM corpus") == "v3")
    assert(one("SELECT v FROM corpus_v3") == "v3")
    assert(one("SELECT v FROM corpus_tag_run_1") == "v1",
      "tag pin must survive the refresh")
    assert(one("SELECT v FROM other") == "v1",
      "narrow refresh must not advance other views")
    // unknown names fail loudly
    intercept[IllegalArgumentException] {
      graft.sources.Lake.refreshCatalog(spark, Seq("nope"))
    }
  }
}
