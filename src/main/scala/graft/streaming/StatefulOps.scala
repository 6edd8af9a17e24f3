package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
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

  /** Streaming near-dup gate — the continuous form of the batch
    * MinHash/LSH dedup (operators.TextDedup): each arriving document
    * is minhashed entirely map-side, its (seed, sig) bucket keys join
    * the per-bucket STATE of previously-seen ids, candidate pairs
    * against those priors are emitted immediately, and the new id
    * joins its buckets. An ingestion pipeline runs this as the dedup
    * gate IN FRONT of the lake instead of re-scanning the corpus.
    *
    * State per bucket = the id list (bounded by bucket occupancy —
    * the same quantity that bounds the batch form's pair fan-out; add
    * a GroupStateTimeout in deployments where buckets churn). A pair
    * sharing several buckets is emitted once per shared bucket;
    * consumers dedup downstream exactly like the batch form's
    * `.distinct()`. */
  def lshCandidateStream(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    val sigs = graft.operators.TextDedup
      .minhashSignatures(docs, idCol, textCol, numHashes)
      .select(concat_ws(":", col("seed"), col("sig")).as("bucket"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
    sigs.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long)], state: GroupState[Seq[Long]]) =>
          var seen = state.getOption.getOrElse(Seq.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          rows.foreach { case (_, id) =>
            if (!seen.contains(id)) {
              seen.foreach(p => out += ((math.min(p, id), math.max(p, id))))
              seen = seen :+ id
            }
          }
          state.update(seen)
          out.iterator
      }
  }

  /** One emitted state row: the key's current value, or a final
    * `deleted = true` marker when a tombstone removed it. */
  case class KeyState(key: Long, value: String, deleted: Boolean)

  /** Streaming-native delete-aware upsert state: per-key latest value
    * kept in the state store; a tombstone record (`value` None — the
    * in-stream form of the envelope's `after: null`,
    * `/root/reference/README.md:135-140`) calls `state.remove()`, so
    * deleted keys cost ZERO state from that batch on (vs the batch
    * form in CdcStreams.latestByKey, which filters at read time). The
    * downstream sees one `deleted = true` row to propagate the
    * retraction, then nothing until the key is re-inserted. Records
    * within a batch apply in arrival order (per-key ordering is the
    * changefeed's contract, README.md:90). */
  def upsertWithTombstones(
      records: Dataset[(Long, Option[String])]): Dataset[KeyState] = {
    import records.sparkSession.implicits._
    records
      .groupByKey(_._1)
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Option[String])],
            state: GroupState[KeyState]) =>
          var cur = state.getOption
          rows.foreach {
            case (_, Some(v)) => cur = Some(KeyState(key, v, deleted = false))
            case (_, None)    => cur = Some(KeyState(key, "", deleted = true))
          }
          cur match {
            case Some(s) if s.deleted => state.remove(); Iterator(s)
            case Some(s)              => state.update(s); Iterator(s)
            case None                 => Iterator.empty
          }
      }
  }
}
