package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{RDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Full-surface sweep for the fourth static-plan hazard class: a
  * PARTITION-LESS window (empty PARTITION BY) collapses its entire
  * input into ONE task for the sort — the r4 q_rfm defect (three
  * partition-less ntile windows over the whole customer dim, invisible
  * at sf0.1, a single-task cliff at a real warehouse; rewritten then
  * to broadcast cut points). Per-query pins exist for the decided
  * cases; this audits every query and every future one.
  *
  * Criterion (the GenJoinAudit bounding-node discipline): a
  * partition-less `WindowExec` is legitimate ONLY when a
  * cardinality-bounding node sits BELOW it in the same subtree —
  *
  *  - an aggregate (HashAggregate / ObjectHashAggregate /
  *    SortAggregate): the window then sorts a rollup (calendar/dim/
  *    vocabulary-bounded), not the corpus — q_win_frame's daily series,
  *    q_ewma's per-type days;
  *  - a top-k (TakeOrderedAndProject / WindowGroupLimit) or a LIMIT:
  *    input bounded outright.
  *
  * A partition-less window with NO bounding node below reads the whole
  * corpus through one task and is flagged. `WindowGroupLimitExec` with
  * an empty partition spec is NOT flagged (it is itself a bounded-heap
  * top-k, the thing one WANTS instead of a full sort).
  *
  * Usage: `sbt "runMain graft.tools.WindowAudit [sfDir] [q_name ...]"`.
  */
object WindowAudit {
  private val bounding = Seq("HashAggregate", "ObjectHashAggregate",
    "SortAggregate", "TakeOrderedAndProject", "WindowGroupLimit",
    "GlobalLimit", "LocalLimit")

  /** Offending chains: for each partition-less WindowExec whose subtree
    * holds no bounding node, the node-class chain from the window down
    * to its source. Public for WindowAuditSpec. */
  def chains(root: SparkPlan): Seq[String] = {
    def descend(p: SparkPlan): Seq[SparkPlan] = p match {
      case c: InMemoryTableScanExec => Seq(c.relation.cachedPlan)
      case other => other.children
    }
    def hasBounding(p: SparkPlan): Boolean = p match {
      // a trackedCheckpoint() read: in declared queries an ExistingRDD
      // is a materialized intermediate that passed the r10 bounded-
      // intermediate decision rule (calendar/dim rollup) by
      // construction — the aggregate that bounded it ran at checkpoint
      // time and is invisible to this walk
      case _: RDDScanExec => true
      case _ =>
        val name = p.getClass.getSimpleName.stripSuffix("Exec")
        bounding.contains(name) || descend(p).exists(hasBounding)
    }
    def sourceChain(p: SparkPlan): List[String] = {
      val name = p.getClass.getSimpleName.stripSuffix("Exec")
      name :: descend(p).headOption.map(sourceChain).getOrElse(Nil)
    }
    def walk(p: SparkPlan): Seq[String] = {
      val here = p match {
        case w: WindowExec if w.partitionSpec.isEmpty && !hasBounding(w.child) =>
          Seq(sourceChain(w).mkString(" <- "))
        case _ => Seq.empty
      }
      here ++ descend(p).flatMap(walk) ++ p.subqueries.flatMap(walk)
    }
    walk(root)
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var hitQueries = 0
    var failed = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val hits = chains(fn(spark, d).queryExecution.executedPlan)
          if (hits.nonEmpty) {
            hitQueries += 1
            hits.distinct.foreach(c => println(s"HIT $name: $c"))
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            failed += 1
            println(s"FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    println(s"""{"metric":"window_audit","unbounded_global_windows":$hitQueries,"failed":$failed}""")
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
