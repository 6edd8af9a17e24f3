package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strict-order funnel as a library call over ANY stage list — the
  * generalized form of q116's view → click → purchase: stage k's
  * timestamp is the key's earliest stage-k event strictly AFTER its
  * stage-(k−1) anchor.
  *
  * Scale: stage k touches only rows of that stage's type (filter
  * BEFORE aggregate), each stage is one key-keyed filter + min
  * aggregate joined to the previous anchor, and every shuffle keys on
  * the same (high-cardinality) key column, so the exchanges co-locate
  * and the joins never reshuffle. No self-joins over the full event
  * table, no windows.
  */
object Funnel {

  /** One row per key that completed stage 1, with nullable timestamp
    * columns `t_<stage>` for each stage and `converted` = 1 when the
    * LAST stage was reached. `typeCol` values select stages; `tsCol`
    * must be comparable at the intended granularity. */
  def strictOrder(df: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "strictOrder: stages must be non-empty")
    require(stages.distinct == stages, "strictOrder: duplicate stage")
    val ev = df.select(col(keyCol), col(typeCol), col(tsCol))
    val first = ev.where(col(typeCol) === stages.head)
      .groupBy(keyCol).agg(min(tsCol).as(s"t_${stages.head}"))
    val anchored = stages.tail.foldLeft((first, s"t_${stages.head}")) {
      case ((acc, prevCol), stage) =>
        val t = ev.where(col(typeCol) === stage)
          .join(acc.select(col(keyCol), col(prevCol)), keyCol)
          .where(col(tsCol) > col(prevCol))
          .groupBy(keyCol).agg(min(tsCol).as(s"t_$stage"))
        (acc.join(t, Seq(keyCol), "left"), s"t_$stage")
    }._1
    anchored.withColumn("converted",
      col(s"t_${stages.last}").isNotNull.cast("int"))
  }
}
