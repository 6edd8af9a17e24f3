package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2.0/§7.5.
  *
  * `queries` is the full operator inventory of SURVEY.md §2, one entry
  * per query key; `oracleSql` carries the DuckDB-dialect twin for every
  * SQL-expressible key (keys absent there get the driver's weaker
  * rows-only check). Implementations live in `graft.queries.*`, grouped
  * by operator family.
  */
object SparkEntry {

  /** Flagship query (the reference's own computation, SURVEY §7.1) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q60_cdc_envelope_roundtrip")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
    graft.queries.SortSetQueries.queries ++
    graft.queries.ScalarQueries.queries ++
    graft.queries.WindowQueries.queries ++
    graft.queries.EventTimeQueries.queries ++
    graft.queries.TextQueries.queries ++
    graft.queries.VectorQueries.queries ++
    graft.queries.GraphQueries.queries ++
    graft.queries.MiningQueries.queries ++
    graft.multimodal.Multimodal.queries ++
    graft.queries.CdcQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
    graft.queries.SortSetQueries.oracles ++
    graft.queries.ScalarQueries.oracles ++
    graft.queries.WindowQueries.oracles ++
    graft.queries.EventTimeQueries.oracles ++
    graft.queries.TextQueries.oracles ++
    graft.queries.VectorQueries.oracles ++
    graft.queries.GraphQueries.oracles ++
    graft.queries.MiningQueries.oracles ++
    graft.multimodal.Multimodal.oracles ++
    graft.queries.CdcQueries.oracles
}
