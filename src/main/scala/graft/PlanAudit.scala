package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit main: prints per-query scale-killer counters
  * (exchanges, nested-loop joins, cartesian products, sorts, cache scans)
  * so a refactor's plan regressions surface without reading 136 full
  * explains. Textual exchange counts inside `InMemoryRelation` subtrees
  * over-report (explain prints the cached plan once per reference; it
  * executes once) — read them together with the `InMemoryTableScan`
  * column.
  *
  * Usage: `sbt "runMain graft.PlanAudit [sfDir] [q_name ...]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val p = fn(spark, d).queryExecution.executedPlan.toString
          def n(tag: String) = p.linesIterator.count(_.contains(tag))
          println(f"$name%-24s exchanges=${n("Exchange ")}%-3d " +
            f"bnlj=${n("BroadcastNestedLoopJoin")} " +
            f"cartesian=${n("CartesianProduct")} " +
            f"cacheScans=${n("InMemoryTableScan")}")
        } catch {
          case e: Throwable => println(f"$name%-24s FAILED: ${e.getMessage}")
        }
      }
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
