package graft.examples

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic epoch-shuffle LAYOUT — the writer behind q172: a
  * training run wants each epoch's global permutation of the corpus
  * materialized as shard directories whose concatenation, read in
  * order, IS the permuted corpus. rand()-free by the house sampling
  * discipline (q119/q134/q152): the permutation is a salted md5 of
  * the row id, so any engine, any retry, and any re-run of the same
  * (seed, corpus) produces byte-identical shard contents — an
  * interrupted epoch resumes from its shard files instead of
  * re-shuffling.
  *
  * Scale shape: ONE hash-partition exchange on the shard id (each
  * shard lands whole in one task → one file, so a shard file read
  * back preserves permutation order), plus a per-partition sort on
  * the position key. Shard count is the parallelism knob — pick
  * ~cluster cores × a small factor at 100 TB; the q172 oracle pins
  * the 16-shard form.
  */
object EpochShuffle {

  /** The permutation columns for `df`: a 48-bit salted-md5 position
    * key `h64` (seed in the salt) and `shard` = h64 mod `nShards`. */
  def permuted(df: DataFrame, idCol: Column, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("h64",
        conv(substring(md5(concat(lit(seed + ":"),
          idCol.cast("string"))), 1, 12), 16, 10).cast("long"))
      .withColumn("shard", pmod(col("h64"), lit(nShards)).cast("int"))
  }

  /** Write one directory per shard (`outDir/shard=<s>/`), rows inside
    * each shard in permutation order. Returns the row count. */
  def writeShards(df: DataFrame, idCol: Column, seed: String,
      nShards: Int, outDir: String): Long = {
    val p = permuted(df, idCol, seed, nShards)
    // one exchange: every shard whole in one task → exactly one data
    // file per shard dir, so a plain read of the dir preserves the
    // within-shard permutation order. The sort LEADS with the shard
    // column: the dynamic-partition writer requires its input sorted
    // by the partition columns and would otherwise insert its own
    // sort on (shard) alone — unstable on ties, silently scrambling
    // the permutation order inside each shard (observed in the spec).
    p.repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h64"), idCol)
      .write.mode("overwrite").partitionBy("shard")
      .parquet(outDir)
    p.sparkSession.read.parquet(outDir).count()
  }
}
