package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print a query key's EXECUTED plan (post-AQE when the
  * second arg is `run`) — the `.explain` feedback loop the build
  * discipline requires (SURVEY §4): check exchanges, reuse, pushdown,
  * codegen spans after every operator change.
  *
  * Usage: graft.Explain <queryKey> [run|plan] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val mode = if (args.length > 1) args(1) else "run"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(key)(spark, sfDir)
    if (mode == "run") {
      // materialize so AQE finalizes the plan (ReusedExchange,
      // runtime broadcasts, skew splits only appear post-execution)
      df.write.format("noop").mode("overwrite").save()
    }
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
