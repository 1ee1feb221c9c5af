package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}
import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

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
  * Memory profile: each task holds k rows per distinct key of its
  * partition UP TO a row budget (`spark.graft.topk.spillRowBudget`,
  * default 2²² retained rows). Past the budget the task SPILLS — the
  * ObjectHashAggregate discipline: the heap map is flushed to a
  * key-sorted run on local disk and a k-way merge of the runs re-heaps
  * each key group at the end, so pathological per-partition key
  * cardinality degrades to sequential IO instead of an executor OOM.
  * Top-k's semigroup property makes the flush safe: a run's ≤ k rows per
  * key are a lossless REDUCTION of the rows consumed so far, and
  * re-heaping merged runs reduces them again (`topk(topk(A) ∪ topk(B)) =
  * topk(A ∪ B)`). Run order is the keys' unsafe-row BYTES — grouping
  * needs adjacency, not a semantic order, and binary equality is key
  * equality. Merge memory is (#runs × k) rows for one key group at a
  * time; `spilledRuns`/`spilledRows` SQL metrics surface spill activity
  * in the UI (a zero-spill run pays only a counter check per row).
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
  * mergeable by simply re-heaping, and equally makes a mid-stream FLUSH of
  * the heap map to a key-sorted spill run lossless (see the class note on
  * the memory profile). */
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

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "spilledRuns" -> SQLMetrics.createMetric(sparkContext, "spilled sorted runs"),
    "spilledRows" -> SQLMetrics.createMetric(sparkContext, "rows written to spill"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = groupKeys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val budget = conf
      .getConfString(TopKPerKeyExec.BudgetConfKey, (1 << 22).toString).toInt
    require(budget >= limit,
      s"${TopKPerKeyExec.BudgetConfKey} ($budget) must hold at least one full heap (k=$limit)")
    val spilledRuns = longMetric("spilledRuns")
    val spilledRows = longMetric("spilledRows")
    child.execute().mapPartitions { it =>
      // group keys are compared as raw UnsafeRow BYTES (map hash + spill
      // run order), so float keys must be normalized the way Spark's own
      // Aggregate/Window keys are (NormalizeFloatingNumbers only rewrites
      // those nodes, not custom ones): without it 0.0 and -0.0 — and
      // distinct NaN bit patterns — form SEPARATE groups and a key can
      // emit up to 2k rows where the window model caps it at k
      val normKeys = keyExprs.map(
        org.apache.spark.sql.graft.Bridge.normalizeFloats)
      val keyProj = UnsafeProjection.create(normKeys, childOutput)
      // identity projection: retained rows become UnsafeRows so a spill can
      // write raw bytes (a non-spilling pass pays one row copy, as before)
      val rowProj = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val ord = RowOrdering.create(sortOrder, childOutput)
      new TopKHeapPass(it, keyProj, rowProj, ord, limit, budget,
        childOutput.length, spilledRuns, spilledRows).result()
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

object TopKPerKeyExec {
  /** Max rows retained across a task's heaps before it spills a sorted run. */
  val BudgetConfKey = "spark.graft.topk.spillRowBudget"
}

/** The per-partition pass: bounded heaps keyed by group, flushing to
  * key-sorted spill runs when the retained-row budget is exceeded, then a
  * grouped k-way merge of the runs (plus the resident map) that re-heaps
  * each key group to its final ≤ k rows. */
private final class TopKHeapPass(
    it: Iterator[InternalRow],
    keyProj: UnsafeProjection,
    rowProj: UnsafeProjection,
    ord: BaseOrdering,
    limit: Int,
    budget: Int,
    numFields: Int,
    spilledRuns: SQLMetric,
    spilledRows: SQLMetric) {

  private val heaps = mutable.HashMap.empty[UnsafeRow, JPriorityQueue[UnsafeRow]]
  private var retained = 0
  private val runs = mutable.ArrayBuffer.empty[File]
  private val readers = mutable.ArrayBuffer.empty[RunReader]

  private def insert(row: InternalRow): Unit = {
    val key = keyProj(row)
    heaps.get(key) match {
      case None =>
        val q = new JPriorityQueue[UnsafeRow](limit, ord.reverse)
        q.add(rowProj(row).copy())
        heaps.put(key.copy(), q)
        retained += 1
        if (retained > budget) spill()
      case Some(q) =>
        if (q.size < limit) { q.add(rowProj(row).copy()); retained += 1 }
        else if (ord.compare(row, q.peek()) < 0) {
          q.poll(); q.add(rowProj(row).copy())
        }
        if (retained > budget) spill()
    }
  }

  /** Entries of the resident map in key-byte order — the run order. */
  private def sortedEntries: Array[(Array[Byte], JPriorityQueue[UnsafeRow])] = {
    val arr = heaps.iterator
      .map { case (key, q) => (key.getBytes, q) }.toArray
    java.util.Arrays.sort(arr,
      (a: (Array[Byte], JPriorityQueue[UnsafeRow]),
       b: (Array[Byte], JPriorityQueue[UnsafeRow])) =>
        java.util.Arrays.compare(a._1, b._1))
    arr
  }

  private def spill(): Unit = {
    val file = File.createTempFile("graft-topk-spill-", ".run",
      TopKHeapPass.spillDir())
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
    var rows = 0L
    try {
      sortedEntries.foreach { case (kb, q) =>
        val rowIt = q.iterator()
        while (rowIt.hasNext) {
          val rb = rowIt.next().getBytes
          out.writeInt(kb.length); out.write(kb)
          out.writeInt(rb.length); out.write(rb)
          rows += 1
        }
      }
    } finally out.close()
    if (runs.isEmpty) {
      // register cleanup the moment the first run exists: a task killed
      // mid-consumption (speculation, cancel, OOM elsewhere) must not
      // orphan multi-GB run files for the application lifetime
      val ctx = TaskContext.get()
      if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => cleanup())
    }
    runs += file
    spilledRuns += 1
    spilledRows += rows
    heaps.clear()
    retained = 0
  }

  def result(): Iterator[InternalRow] = {
    it.foreach(insert)
    if (runs.isEmpty) return heaps.valuesIterator.flatMap(_.iterator().asScala)
    // Spilled: merge the on-disk runs with the resident map (itself walked
    // in key-byte order as one more run), re-heaping per key group.
    // (cleanup was registered when the first run spilled)
    val residentRun: Iterator[(Array[Byte], UnsafeRow)] =
      sortedEntries.iterator.flatMap { case (kb, q) =>
        q.iterator().asScala.map(kb -> _)
      }
    runs.foreach(f => readers += new RunReader(f, numFields))
    val cursors =
      (readers.map(_.buffered).toSeq
        :+ residentRun.buffered).filter(_.hasNext)
    new Iterator[InternalRow] {
      private var group: Iterator[UnsafeRow] = Iterator.empty
      override def hasNext: Boolean = group.hasNext || cursors.exists(_.hasNext)
      override def next(): InternalRow = {
        while (!group.hasNext) {
          // smallest key across cursors starts the next group
          val live = cursors.filter(_.hasNext)
          val minKey = live.map(_.head._1)
            .reduce((a, b) => if (java.util.Arrays.compare(a, b) <= 0) a else b)
          val q = new JPriorityQueue[UnsafeRow](limit, ord.reverse)
          live.foreach { c =>
            while (c.hasNext &&
                java.util.Arrays.equals(c.head._1, minKey)) {
              val row = c.next()._2
              if (q.size < limit) q.add(row)
              else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row) }
            }
          }
          group = q.iterator().asScala
        }
        group.next()
      }
    }
  }

  private def cleanup(): Unit = {
    readers.foreach(_.closeQuietly())
    runs.foreach { f => f.delete(); () }
  }
}

private object TopKHeapPass {
  /** Spill into the executor's scratch disks resolved the way Spark's own
    * spilling operators resolve theirs (`Utils.getLocalDir` via the
    * Bridge: honors SPARK_LOCAL_DIRS and YARN/k8s-provided dirs, not just
    * the `spark.local.dir` conf key — on those clusters the conf key is
    * typically unset and a conf-only read would land spills on the
    * container root disk). Falls back to tmpdir when no Spark env exists
    * (plain unit tests). */
  private lazy val localDir: File =
    org.apache.spark.sql.graft.Bridge.localDir()
      .map(new File(_)).filter(_.isDirectory)
      .getOrElse(new File(System.getProperty("java.io.tmpdir")))

  def spillDir(): File = localDir
}

/** Sequential reader of one spill run: (keyBytes, row) records in the run's
  * key order. Rows rematerialize by pointing an UnsafeRow at the bytes. */
private final class RunReader(file: File, numFields: Int)
  extends Iterator[(Array[Byte], UnsafeRow)] {
  private val in = new DataInputStream(
    new BufferedInputStream(new FileInputStream(file), 1 << 16))
  private var nextRec: (Array[Byte], UnsafeRow) = _
  advance()

  private def advance(): Unit = {
    // EOF is only legitimate BEFORE a record's first byte; once a length
    // header was read, hitting EOF means the run was truncated (torn write,
    // external tampering with scratch disk) and silently treating it as
    // end-of-run would drop rows from the merge — fail the task instead so
    // Spark retries it and respills.
    val keyLen =
      try in.readInt()
      catch { case _: EOFException => in.close(); nextRec = null; return }
    nextRec =
      try {
        val kb = new Array[Byte](keyLen); in.readFully(kb)
        val rb = new Array[Byte](in.readInt()); in.readFully(rb)
        val row = new UnsafeRow(numFields)
        row.pointTo(rb, rb.length)
        (kb, row)
      } catch {
        case e: EOFException =>
          closeQuietly()
          throw new java.io.IOException(
            s"truncated top-k spill run ${file.getName}: EOF inside a record", e)
      }
  }

  override def hasNext: Boolean = nextRec != null
  override def next(): (Array[Byte], UnsafeRow) = {
    val r = nextRec; advance(); r
  }

  /** For task-completion cleanup when a downstream limit abandons the
    * merge before EOF (EOF already closed the stream otherwise). */
  def closeQuietly(): Unit =
    try in.close() catch { case _: java.io.IOException => }
}
