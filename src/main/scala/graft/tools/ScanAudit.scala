package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, RDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Full-surface sweep for the round-10 re-scan hazard, generalized from
  * the q_hll_merge fix: a query that derives two results from the same
  * source (a direct pass and a partial/merged pass, a baseline and a
  * contrast) re-SCANS the table once per subtree, because Catalyst does
  * not share deduplicated subplans — at 100 TB each extra scan is a full
  * extra pass over the corpus. q_hll_merge carried a third events scan
  * (plus a join and two exchanges) just to count partials; folding the
  * count into the merge stream removed it.
  *
  * For every `SparkEntry.queries` entry this walks the STATIC physical
  * plan (AQE off) and tallies source scans per table — v1
  * `FileSourceScanExec` by parquet root path, DSv2 `BatchScanExec` by
  * scan class — in two ledgers: PER-RUN scans (outside any cache — paid
  * on every execution of the query) and CACHE-BUILD scans (inside an
  * `InMemoryTableScan`'s cached subtree, counted once per distinct
  * cache: a `cached()` corpus-snapshot asset materializes once and
  * amortizes across every query that reads it, so charging it per
  * consumer would overstate the IO). Queries where one table's PER-RUN
  * count >= the threshold (default 3) print as HIT with both ledgers
  * for triage: an iterative algorithm that genuinely needs per-round
  * passes, a bounded dimension table, or a pushed point-probe filter is
  * legitimate; a direct+partial formulation whose second derivation
  * could ride an existing stream (the hll case) or a bounded
  * intermediate worth a `trackedCheckpoint()` is the fixable shape.
  *
  * Usage: `sbt "runMain graft.tools.ScanAudit [sfDir] [threshold] [q ...]"`.
  */
object ScanAudit {
  /** (per-run table tally, cache-build table tally) for one physical
    * plan. Cached subtrees counted once per distinct cache. Public for
    * ScanAuditSpec. */
  def tally(root: SparkPlan): (Map[String, Int], Map[String, Int]) = {
    val seenCaches = new java.util.IdentityHashMap[SparkPlan, Unit]()
    def tableOf(p: SparkPlan): Option[String] = p match {
      case f: FileSourceScanExec =>
        Some(f.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("<v1>"))
      case b: BatchScanExec => Some(b.scan.getClass.getSimpleName)
      // a trackedCheckpoint() read: the upstream subtree (and its source
      // scan) ran ONCE at query construction and is invisible to this
      // walk — surfaced as a marker so a plan full of "<rdd>" reads is
      // never mistaken for a plan that scans nothing. Markers are
      // excluded from the HIT threshold (reads of materialized state,
      // not corpus passes).
      case _: RDDScanExec => Some("<rdd>")
      case _ => None
    }
    def walk(p: SparkPlan, inCache: Boolean): Seq[(String, Boolean)] = p match {
      case c: InMemoryTableScanExec =>
        if (seenCaches.containsKey(c.relation.cachedPlan)) Seq.empty
        else {
          seenCaches.put(c.relation.cachedPlan, ())
          walk(c.relation.cachedPlan, inCache = true)
        }
      case other =>
        tableOf(other).map(_ -> inCache).toSeq ++
          other.children.flatMap(walk(_, inCache)) ++
          other.subqueries.flatMap(walk(_, inCache))
    }
    val all = walk(root, inCache = false)
    def count(xs: Seq[(String, Boolean)]) =
      xs.groupBy(_._1).map { case (t, ys) => t -> ys.size }
    (count(all.filterNot(_._2)), count(all.filter(_._2)))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.drop(2).toSet
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
          val (perRun, cacheBuild) =
            tally(fn(spark, d).queryExecution.executedPlan)
          val hot = perRun.filter { case (t, n) =>
            n >= threshold && !t.startsWith("<") }
          if (hot.nonEmpty) {
            hitQueries += 1
            val detail = perRun.toSeq.sortBy(-_._2)
              .map { case (tab, n) => s"$tab x$n" }.mkString(", ")
            val cacheDetail =
              if (cacheBuild.isEmpty) ""
              else cacheBuild.toSeq.sortBy(-_._2)
                .map { case (tab, n) => s"$tab x$n" }
                .mkString(" [cache-build: ", ", ", "]")
            println(s"HIT $name: $detail$cacheDetail")
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            failed += 1
            println(s"FAILED $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    println(s"""{"metric":"scan_audit","threshold":$threshold,"queries_with_rescan":$hitQueries,"failed":$failed}""")
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
