package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom incremental state (SURVEY.md §2.9) — the
  * `flatMapGroupsWithState` primitive behind bespoke CDC
  * materializations that windowed aggregates can't express (running
  * non-algebraic state machines, conditional emissions, per-key
  * TTLs).
  *
  * Scale: state is partitioned by key across executors exactly like a
  * streaming aggregation (one entry per key in the state store); use
  * a GroupStateTimeout to bound the key universe when keys churn.
  */
object StatefulOps {

  case class UserAgg(user_id: Long, n: Long, max_val: Double)

  /** Running count + max per key, emitted on every micro-batch a key
    * changes in (update mode). Input: (key, value) pairs. */
  def runningUserAggs(events: Dataset[(Long, Double)]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(key, 0L, Double.NegativeInfinity))
          var n = prev.n
          var m = prev.max_val
          rows.foreach { case (_, v) => n += 1; m = math.max(m, v) }
          val next = UserAgg(key, n, m)
          state.update(next)
          Iterator(next)
      }
  }
}
