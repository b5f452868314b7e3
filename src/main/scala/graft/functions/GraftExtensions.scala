package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point: setting
  *
  * {{{ spark.sql.extensions = graft.functions.GraftExtensions }}}
  *
  * on ANY session builder registers the graft SQL function surface at
  * session construction — the declarative library-integration path for
  * external users (cluster-wide via spark-defaults.conf, no imperative
  * call sites). [[DotProductExpr.registerSql]] remains for attaching to
  * an already-live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      DotProductExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bigram_codes"),
      new ExpressionInfo(classOf[BigramCodesExpr].getName, "graft_bigram_codes"),
      BigramCodesExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_space_saving"),
      new ExpressionInfo(classOf[SpaceSavingAgg].getName, "graft_space_saving"),
      SpaceSavingAgg.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc"),
      NfcNormalizeExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrderExpr].getName, "graft_zorder"),
      ZOrderExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv"),
      KmvSketchAgg.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_pair"),
      new ExpressionInfo(classOf[KmvPairExpr].getName, "graft_kmv_pair"),
      KmvPairExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bksample"),
      new ExpressionInfo(classOf[BottomKSampleAgg].getName, "graft_bksample"),
      BottomKSampleAgg.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bksample_quantile"),
      new ExpressionInfo(classOf[BkSampleQuantileExpr].getName, "graft_bksample_quantile"),
      BkSampleQuantileExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom"),
      new ExpressionInfo(classOf[BloomSketchAgg].getName, "graft_bloom"),
      BloomSketchAgg.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "graft_bloom_contains"),
      BloomContainsExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_estimate"),
      new ExpressionInfo(classOf[KmvEstimateExpr].getName, "graft_kmv_estimate"),
      KmvEstimateExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_count_min"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "graft_count_min"),
      CountMinAgg.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_cm_estimate"),
      new ExpressionInfo(classOf[CountMinEstimateExpr].getName, "graft_cm_estimate"),
      CountMinEstimateExpr.sqlBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_ams_f2"),
      new ExpressionInfo(classOf[AmsF2Agg].getName, "graft_ams_f2"),
      AmsF2Agg.sqlBuilder))
    // whole-operator tier: the merge-based as-of join (plans/AsOfJoinPlan)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // optimizer-rule tier: collapse idempotent nested NFC applications
    ext.injectOptimizerRule(_ => CollapseNfcRule)
  }
}
