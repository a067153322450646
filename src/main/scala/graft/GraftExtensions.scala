package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The engine's `SparkSessionExtensions` hook — the deployment-grade
  * registration path for every custom Catalyst surface the library
  * ships (brief §custom-operators tier (b)/(c)):
  *
  *  - `AsofJoinStrategy` planner strategy (the native as-of join
  *    LogicalPlan → SparkPlan mapping, [[graft.plans.AsofJoin]])
  *  - `simhash32(tokens)` / `minhash32(shingles, k)` native expressions
  *    (real `doGenCode`, [[graft.functions.SimHash32]] /
  *    [[graft.functions.MinHash32]])
  *
  * Activate cluster-wide with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), so
  * SQL-only users get the operators without touching the Scala API.
  * The per-session `register(...)`/`extraStrategies` calls remain as
  * the lightweight path for programmatic sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[graft.functions.SimHash32].getName, "simhash32"),
      exprs => {
        require(exprs.length == 1, s"simhash32(tokens) takes 1 arg, got ${exprs.length}")
        graft.functions.SimHash32(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash32"),
      new ExpressionInfo(classOf[graft.functions.MinHash32].getName, "minhash32"),
      graft.functions.MinHash32.fromExprs))
  }
}
