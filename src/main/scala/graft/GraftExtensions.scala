package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomAgg, BloomMightContain, BottomKAgg, FloatVectorDot, MinHashAgg, SortedIntersectCount}

/** Canonical integration point: sessions built with
  * `spark.sql.extensions=graft.GraftExtensions` get the native expressions
  * as SQL-callable functions (`SELECT vec_dot_f(a, b)`), no imperative
  * registration needed. The Scala helpers (`FloatVectorDot.dotF`,
  * `SortedIntersectCount.interCount`) remain self-registering for sessions
  * created without the config. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Opt-in range-join binning (spark.graft.rangeJoin.binWidth) — rewrites
    // pure interval-point joins away from BroadcastNestedLoopJoin.
    ext.injectOptimizerRule(_ => new graft.plans.BinnedRangeJoinRule)
    // Opt-in automatic Bloom semi-join reduction
    // (spark.graft.bloomJoin.enabled) — plants a deterministic Bloom build
    // + probe around joins Spark's own runtime-filter heuristics skip.
    ext.injectOptimizerRule(_ => new graft.plans.AutoBloomJoinRule)
    // Grouped top-k: plans graft.plans.TopKPerKey logical nodes as
    // partial→final bounded-heap passes (map-side k-reduction the window
    // formulation cannot do).
    ext.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((
      FunctionIdentifier("vec_dot_f"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot_f"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) => BloomAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "graft_bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("bottom_k"),
      new ExpressionInfo(classOf[BottomKAgg].getName, "bottom_k"),
      (exprs: Seq[Expression]) => BottomKAgg(exprs.head,
        graft.functions.FnArgs.literalInt(exprs(1), "bottom_k", "k"))))
  }
}
