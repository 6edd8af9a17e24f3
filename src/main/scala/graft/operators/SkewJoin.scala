package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for a skewed build pattern AQE's skew-join rule
  * cannot serve (it only splits sort-merge partitions at runtime; a
  * skewed stream-side key in a shuffled hash join, or a deliberately
  * AQE-less job, still hot-spots one task).
  *
  * The LEFT (skewed) side gets a deterministic salt derived from a
  * whole-row hash — no `rand()`, so retried tasks salt identically and
  * the operator stays resumable; the RIGHT side replicates across all
  * salts (cost: |right| × salts rows, so `salts` trades replication
  * for spread). The join key becomes (keys, salt): a key holding half
  * the table now lands on `salts` tasks instead of one.
  */
object SkewJoin {

  /** Inner equi-join on `keys`, left-side skew spread over `salts`
    * partitions per key. Result equals `left.join(right, keys)`
    * (property-pinned in AlgebraProps). */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    val leftCols: Seq[Column] = left.columns.map(col).toSeq
    val salted = left.withColumn("__salt",
      pmod(hash(leftCols: _*), lit(salts)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
