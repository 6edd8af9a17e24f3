package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library wiring for `spark.sql.extensions=graft.GraftExtensions`:
  * installs the engine's native expressions and UDAFs into every
  * session built on the cluster, so SQL users get `simhash64(text)`
  * and `wmean(x, w)` without imperative registration. The same
  * builders back the imperative path (`GraftExtensions.registerAll`)
  * used by tests and the query modules.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // refuse raw datasource writes into Snapshot-managed directories
    // (round 14 — the CETAS twin's guard rail; see ManagedPathGuard)
    ext.injectOptimizerRule(_ => graft.sources.ManagedPathGuard)
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bucket_search"),
      new ExpressionInfo(classOf[graft.functions.BucketSearch].getName, "bucket_search"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BucketSearch(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("json_value"),
      new ExpressionInfo(classOf[graft.functions.JsonValue].getName, "json_value"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.JsonValue(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("is_json"),
      new ExpressionInfo(classOf[graft.functions.IsJson].getName, "is_json"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.IsJson(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("json_query"),
      new ExpressionInfo(classOf[graft.functions.JsonQuery].getName, "json_query"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.JsonQuery(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("openjson_entries"),
      new ExpressionInfo(classOf[graft.functions.OpenJsonEntries].getName, "openjson_entries"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.OpenJsonEntries(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("json_modify"),
      new ExpressionInfo(classOf[graft.functions.JsonModify].getName, "json_modify"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.JsonModify(exprs(0), exprs(1), exprs(2),
          raw = exprs(2).isInstanceOf[graft.functions.JsonQuery])))
  }
}

object GraftExtensions {
  /** Imperative twin for an already-running session. */
  def registerAll(spark: SparkSession): Unit = {
    // idempotent: experimental.extraOptimizations is a plain Seq —
    // only append the guard once per session
    if (!spark.experimental.extraOptimizations
        .contains(graft.sources.ManagedPathGuard))
      spark.experimental.extraOptimizations ++=
        Seq(graft.sources.ManagedPathGuard)
    graft.functions.SimHash64.register(spark)
    graft.functions.CosineSim.register(spark)
    graft.functions.WeightedMean.register(spark)
    graft.functions.BucketSearch.register(spark)
    graft.functions.JsonValue.register(spark)
    graft.functions.IsJson.register(spark)
    graft.functions.JsonQuery.register(spark)
    graft.functions.OpenJsonEntries.register(spark)
    graft.functions.JsonModify.register(spark)
  }
}
