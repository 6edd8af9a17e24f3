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
}
