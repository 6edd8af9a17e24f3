package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (SURVEY.md §4). Correctness is the
  * oracle's job; this suite pins the PLANS — the properties that
  * decide whether a query survives a 100 TB scale-up: filters and
  * projections reaching the parquet scan, small dims broadcast,
  * aggregates split partial/final, top-k short-circuiting instead of
  * global sorts, and custom expressions staying inside whole-stage
  * codegen. A refactor that silently loses one of these still passes
  * the oracle at sf0.01 — this suite is what catches it.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filter is pushed into the parquet scan") {
    val p = plan("q02_scan_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"no pushed filters in:\n$p")
    // projection pruning: untouched wide columns must not be read
    assert(!p.contains("l_comment"), "scan reads unprojected columns")
  }

  test("q01: scan reads only the projected columns") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("q15/q19: dimension joins are broadcast, not shuffled") {
    assert(plan("q15_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("q19_join_multiway").contains("BroadcastHashJoin"))
  }

  test("q21: aggregate splits into partial + final") {
    val p = plan("q21_agg_group")
    assert(p.contains("partial_sum") || p.contains("partial"),
      s"no map-side combine in:\n$p")
  }

  test("q41: global top-k short-circuits (no full sort)") {
    val p = plan("q41_topk")
    assert(p.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$p")
  }

  test("q84: brute-force cosine has no explode and broadcasts the query vector") {
    val p = plan("q84_vec_cosine_topk")
    assert(!p.contains("Generate"), "cosine top-k fans out via explode")
    assert(p.contains("Broadcast"), "query vector not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k does a full sort")
  }

  test("q88: simhash64 expression stays inside whole-stage codegen") {
    val df = SparkEntry.queries("q88_simhash")(spark, sf)
    // AQE only finalizes stages on execution; run it, then inspect the
    // final plan for the codegen span around the simhash projection.
    assert(df.collect().nonEmpty)
    val p = df.queryExecution.executedPlan.toString
    // `*(n)` is the whole-stage-codegen marker in the final plan; the
    // simhash projection must carry it (a CodegenFallback would not).
    assert(p.contains("*(") , s"no codegen span in:\n$p")
    assert(p.linesIterator.exists(l => l.contains("simhash64") && l.contains("*(")),
      s"simhash64 projection outside the codegen span:\n$p")
  }

  test("q60: envelope pipeline is map-side until the group-by") {
    val p = plan("q60_cdc_envelope_roundtrip")
    // exactly the aggregation exchange + the spread/emit exchanges —
    // no extra shuffle introduced by the JSON round-trip itself
    assert(!p.contains("SortMergeJoin"),
      "customer dim failed to broadcast; fact table is being shuffled for the join\n" + p)
  }
}
