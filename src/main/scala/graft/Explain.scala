package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print a query key's EXECUTED plan (post-AQE when the
  * second arg is `run`) — the `.explain` feedback loop the build
  * discipline requires (SURVEY §4): check exchanges, reuse, pushdown,
  * codegen spans after every operator change.
  *
  * Usage: graft.Explain <queryKey> [run|plan|fmt] [sfDir] [outFile]
  *
  * `fmt` materializes through noop (so AQE finalizes), then prints the
  * FORMATTED plan (`explain("formatted")` — numbered operators, pushed
  * filters, read schema, exchange partitioning); with a 4th arg the
  * formatted text is also written to that file (the plans/rNN/
  * before/after artifact the optimization rounds commit). Multiple
  * comma-separated keys are accepted in fmt mode; outFile then gets
  * `_<key>` inserted per key.
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
    if (mode == "fmt") {
      val out = if (args.length > 3) Some(args(3)) else None
      key.split(",").map(_.trim).filter(_.nonEmpty).foreach { k =>
        val df = SparkEntry.queries(k)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(s"=== $k ===")
        println(txt)
        out.foreach { o =>
          val p = if (key.contains(",")) {
            val dot = o.lastIndexOf('.')
            if (dot > 0) o.substring(0, dot) + "_" + k + o.substring(dot)
            else o + "_" + k
          } else o
          java.nio.file.Files.writeString(java.nio.file.Paths.get(p), txt)
        }
      }
      spark.stop(); return
    }
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
