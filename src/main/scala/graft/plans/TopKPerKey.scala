package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** GROUPED TOP-K as a first-class operator: the top `k` rows of every
  * group under `order`, planned as partial (map-side) heaps → shuffle on
  * the group key → final heaps.
  *
  * This is the whole-operator gap in Spark's built-ins: `row_number()
  * OVER (PARTITION BY key ORDER BY x) <= k` must SORT every row of every
  * group (a window sort over the full input), while top-k is a
  * semigroup — `topk(topk(A) ∪ topk(B)) = topk(A ∪ B)` — so bounded
  * per-key heaps can reduce map-side and ship AT MOST k rows per (key,
  * partition) into the exchange. Same physics as Spark's own global
  * `TakeOrderedAndProject`, per key. At 100 TB the shuffle carries
  * k·|keys| rows instead of the corpus.
  *
  * The operator demonstrates the deepest extension tier: a logical node,
  * a planner [[SparkStrategy]] injected via `GraftExtensions`, and a
  * physical [[UnaryExecNode]] whose distribution requirement lets
  * EnsureRequirements place the exchange. Ties at the k boundary must be
  * broken by a total `order` (include a unique column), same determinism
  * rule as every ranking query in SURVEY §2.
  *
  * Memory profile (stated, not hidden): each task holds k rows per
  * distinct key of its partition — the HashAggregate profile WITHOUT the
  * spill path Spark's own aggregates have. At pathological per-partition
  * key cardinality a production version would spill sorted runs like
  * ObjectHashAggregate; within this repo's contract the operator is used
  * where k·|keys| per partition is bounded (and the window alternative
  * holds the same rows PLUS the sort buffer).
  */
case class TopKPerKey(
    groupKeys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
  extends UnaryNode {
  require(k >= 1, s"top-k needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** Public entry: top `k` rows per `keys` group, ordered by `orderBy`
    * (column name → ascending?) — names resolve against `df`'s schema
    * through the normal analyzer. */
  def of(spark: SparkSession, df: DataFrame, keys: Seq[String],
         orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val sortOrder = orderBy.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      TopKPerKey(keys.map(UnresolvedAttribute.quoted), sortOrder, k,
        df.queryExecution.logical))
  }
}

/** Plans the logical node as partial → final heap passes; the final node's
  * clustered-distribution requirement makes EnsureRequirements insert the
  * key exchange between them. */
class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** One heap pass: per input partition, a bounded max-heap (size ≤ k,
  * ordered so the peek is the WORST kept row) per group key. Both phases
  * run the identical pass — the semigroup property makes partial results
  * mergeable by simply re-heaping. */
case class TopKPerKeyExec(
    groupKeys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupKeys) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = groupKeys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // peek = worst kept row (reverse of the rank order)
      val heaps = mutable.HashMap.empty[UnsafeRow, JPriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val q = new JPriorityQueue[InternalRow](limit, ord.reverse)
            q.add(row.copy())
            heaps.put(key.copy(), q)
          case Some(q) =>
            if (q.size < limit) q.add(row.copy())
            else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}
