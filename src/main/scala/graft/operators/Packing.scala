package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence PACKING — the step between cleaning and batching in an
  * LLM training-data pipeline: concatenate short documents into
  * fixed-capacity token bins (context windows) so padding waste stays
  * low. Exact greedy first-fit is inherently SEQUENTIAL (each bin's
  * remaining capacity depends on every prior document), so the
  * scalable form shards the corpus into `streams` INDEPENDENT
  * sequential walks:
  *
  *  - stream id = md5-derived hash of the doc id (deterministic on
  *    any engine, any retry — the house no-rand() contract), so the
  *    split is uniform and replayable;
  *  - within a stream, docs pack greedily in doc-id order: a doc goes
  *    into the current bin iff it fits the remaining capacity, else
  *    it opens a new bin; a doc longer than the capacity gets a bin
  *    of its own (callers chunk oversize docs upstream);
  *  - bins are numbered per (stream), 1-based, so (stream, bin) is
  *    the packed-sequence key.
  *
  * Scale shape: one shuffle on the stream key, then a SORTED
  * per-partition scan with O(1) state — `mapPartitions` streams
  * through the iterator, never materializing a group (the
  * rarely-justified imperative escape hatch: the walk is a
  * non-associative chain, so neither an aggregate nor a window can
  * express it). Parallelism = `streams`; pick streams ≳ cluster cores
  * and the hash keeps them balanced. Waste is within a doc-length of
  * first-fit-decreasing in expectation at realistic length mixes —
  * the trade for a deterministic, shardable walk.
  */
object Packing {

  /** Pack `df`'s rows into ≤ `capacity`-token bins per hashed stream.
    * Returns (idCol, stream, bin); deterministic for a given
    * (idCol, lenCol) regardless of partitioning. */
  def packGreedy(df: DataFrame, idCol: String, lenCol: String,
      capacity: Long, streams: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(streams >= 1, s"streams must be >= 1, got $streams")
    // the walk keys and orders on a LONG id; a silent cast of a
    // string-keyed corpus would null every id and randomize the walk
    val idType = df.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(idType),
      s"packGreedy: $idCol must be an integral id column, got $idType " +
        "(hash string ids to a long upstream)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint) % $streams")
          .cast("int").as("stream"),
        col(idCol).cast("long").as("__id"),
        // loud map-side guard (round-7 ADVICE): a zero/negative/null
        // length would silently corrupt the packing invariant (a
        // negative len INCREASES remaining capacity; a zero-length doc
        // joins even a full bin) — malformed input fails the job, the
        // same convention as the other operators' raise_error guards
        when(col(lenCol).cast("long") >= 1, col(lenCol).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"packGreedy: $lenCol must be >= 1, got "),
            coalesce(col(lenCol).cast("string"), lit("null")))))
          .as("__len"))
      .repartition(col("stream"))
      .sortWithinPartitions("stream", "__id")
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        // streams are contiguous after the sort; reset at boundaries
        var cur = Int.MinValue
        var bin = 0L
        var rem = 0L
        it.map { case (st, id, len) =>
          if (st != cur) { cur = st; bin = 0L; rem = 0L }
          if (bin == 0L || len > rem) { bin += 1; rem = math.max(0L, capacity - len) }
          else rem -= len
          (id, st, bin)
        }
      }
      .toDF(idCol, "stream", "bin")
  }
}
