package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Misra–Gries heavy hitters as a typed `Aggregator` — the
  * CONSTANT-STATE approximate twin of an exact `groupBy(key).count()`
  * top-k (q120): at most `k` counters per aggregation buffer, no
  * matter how many distinct keys stream through. The exact form's
  * state is O(distinct keys); on a 100 TB key column that is the
  * whole key dictionary in memory, while this sketch is k longs.
  *
  * Guarantees (Misra–Gries 1982; merge bound from Agarwal et al.,
  * "Mergeable Summaries", PODS'12 — partial aggregation and
  * executor-side combine preserve it):
  *  - every key with true frequency > n/(k+1) is IN the summary;
  *  - each reported count UNDERCOUNTS its true frequency by at most
  *    n/(k+1) (and never overcounts).
  * Both properties are pinned by an AlgebraProps brute-force property
  * over random skewed streams, including the multi-partition path.
  *
  * The buffer is a plain Map[key → count]; `reduce` does the classic
  * decrement-all on overflow, `merge` adds counts then subtracts the
  * (k+1)-th largest (the mergeable-summaries offset rule), keeping
  * positives. `finish` emits (key, lower-bound count) sorted by
  * (count desc, key asc) — deterministic across retries because the
  * final counter SET is data-determined (the per-partition arrival
  * order only shifts which epsilon-band keys survive; the property
  * tests only assert the guarantees, and the q150 fixture's hot keys
  * sit far above the band).
  */
class MisraGries(k: Int) extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], x: Long): Map[Long, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement every counter; drop zeros (the arriving key's
        // implicit counter cancels against them)
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(b1: Map[Long, Long], b2: Map[Long, Long]): Map[Long, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everyone, keep
      // positives: ≤ k survive, and total decrement stays within the
      // mergeable n/(k+1) bound
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[Long, Long]): Seq[(Long, Long)] =
    b.toSeq.sortBy { case (key, c) => (-c, key) }

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object MisraGries {
  /** Register `mg_topk_<k>(x)` — the name carries k, so two call
    * sites with different budgets can never silently share one
    * registration in a long-lived session. Idempotent per name — see
    * SimHash64.register. */
  def register(spark: SparkSession, k: Int = 32): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(s"mg_topk_$k")))
      spark.udf.register(s"mg_topk_$k", functions.udaf(new MisraGries(k)))
}
