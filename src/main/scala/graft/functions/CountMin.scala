package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Count–Min sketch hashing (q177 / s40) — d independent md5-seeded
  * rows of w buckets. The sketch itself is just a (row, bucket, count)
  * table: cells are exact counts, so sketches MERGE by cell-wise
  * addition (per-day / per-micro-batch sketches union by bin-sum —
  * the q149/q157 incremental-lakehouse contract) and a point estimate
  * is min over rows of the key's bucket count, which can only ever
  * over-count (est ≥ exact, the CMS guarantee).
  *
  * The row hash is the house md5 family (hashDraw / minhash): a
  * 60-bit integer from the first 15 hex digits of
  * md5("cms<i>:<key>"), mod the width — deterministic, engine-
  * replayable arithmetic (the DuckDB oracle reproduces every cell),
  * non-negative so a plain `%` is safe.
  */
object CountMin {

  /** Bucket of `key` (string column) in sketch row `i`. */
  def bucket(i: Column, key: Column, width: Int): Column =
    conv(substring(md5(concat(lit("cms"), i.cast("string"), lit(":"), key)),
      1, 15), 16, 10).cast("long") % width

  /** Sparse CMS cells `(i, b, c)` of `df`'s `keyCol`: one map-side-
    * combinable aggregate to ≤ depth×width rows — constant state at
    * any input size. */
  def cells(df: org.apache.spark.sql.DataFrame, keyCol: String,
      depth: Int, width: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(sequence(lit(0), lit(depth - 1))).as("i"),
        col(keyCol).cast("string").as("__k"))
      .groupBy(col("i"), bucket(col("i"), col("__k"), width).as("b"))
      .agg(count(lit(1)).as("c"))
}
