package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: enables
  * `--conf spark.sql.extensions=graft.GraftExtensions` so SQL users get
  * the engine's native functions (`graft_dot`, …) without touching Scala.
  * Sessions created programmatically can call
  * [[graft.functions.VectorExpressions.register]] instead — the operator
  * implementations do so on first use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.VectorExpressions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectPlannerStrategy(_ => plans.AsOfStrategy)
    // exact bitmap rewrite of integer COUNT(DISTINCT) aggregates —
    // conf-gated (spark.graft.bitmapCountDistinct.enabled)
    ext.injectOptimizerRule(_ => plans.BitmapDistinctRewrite)
    // SQL MERGE INTO on the manifest store → the merge-on-read commit
    // (post-hoc: Spark's own row-level rewrite skips non-row-level
    // tables, leaving the resolved MergeIntoTable for this rule)
    ext.injectPostHocResolutionRule(s => plans.ManifestMergeRule(s))
    // SQL UPDATE on the manifest store → bounded read-modify-write
    // through the same one-version merge commit
    ext.injectPostHocResolutionRule(s => plans.ManifestUpdateRule(s))
  }
}
