package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Full-surface sweep for the round-9 blind-stats hazard, generalized:
  * Spark's static size estimate does not model the row multiplication of
  * `Generate` (explode) — a unary node's sizeInBytes is scaled by the
  * row-WIDTH ratio only — so any join planned above an explode
  * under-estimates the exploded side and can pick a broadcast build that
  * is really corpus-sized (the symdel lane's measured 6.5×-slower /
  * OOM-at-×20 mis-plan, BASELINE r9 crossover_v3).
  *
  * For every `SparkEntry.queries` entry this walks the STATIC physical
  * plan (AQE off — the hazard is the static planner's choice; AQE
  * re-plans from accurate runtime sizes) and reports each
  * `BroadcastExchange` whose build subtree contains a `GenerateExec`,
  * with the node chain from the exchange down to the Generate so a hit
  * can be triaged: an aggregate over a BOUNDED key space between the two
  * is legitimate (the broadcast side is small no matter what the explode
  * produced); a chain with no cardinality-reducing node between them is
  * the mis-plan. Cached subtrees (`InMemoryTableScan`) are descended
  * into, since the hazard applies at cache materialization too.
  *
  * Usage: `sbt "runMain graft.tools.GenJoinAudit [sfDir] [q_name ...]"`.
  * Prints one line per query with hits, then a summary tally.
  */
object GenJoinAudit {
  /** Node chain from `root` down to the first GenerateExec in each
    * broadcast subtree: class names only, cache boundaries marked.
    * Public because GenJoinAuditSpec pins the triage criterion over the
    * full surface with the same walker. */
  def chains(root: SparkPlan): Seq[String] = {
    def descend(p: SparkPlan): Seq[SparkPlan] = p match {
      case c: InMemoryTableScanExec => Seq(c.relation.cachedPlan)
      case other => other.children
    }
    def firstGenChain(p: SparkPlan, acc: List[String]): Option[List[String]] = {
      val name = p.getClass.getSimpleName.stripSuffix("Exec")
      p match {
        case _: GenerateExec => Some((name :: acc).reverse)
        case _ =>
          descend(p).iterator
            .map(firstGenChain(_, name :: acc))
            .collectFirst { case Some(c) => c }
      }
    }
    def bcasts(p: SparkPlan): Seq[BroadcastExchangeExec] = p match {
      case b: BroadcastExchangeExec => b +: descend(b).flatMap(bcasts)
      case other => descend(other).flatMap(bcasts)
    }
    bcasts(root).flatMap(b => firstGenChain(b, Nil).map(_.mkString(" <- ")))
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
          val plan = fn(spark, d).queryExecution.executedPlan
          val hits = chains(plan)
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
    println(s"""{"metric":"gen_join_audit","queries_with_bcast_over_generate":$hitQueries,"failed":$failed}""")
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
