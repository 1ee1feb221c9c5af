package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan probe for the symdel candidate lane at grown scales
  * (round 9): the g=20 LinkageCrossover run died in
  * "Not enough memory to build and broadcast" inside the variant
  * self-join — post-explode cardinality (~172× rows) is invisible to
  * the static size estimate, so the planner picks a broadcast that
  * cannot survive the scale the lane exists for. This prints the
  * chosen join strategy and times the candidate count under the
  * default stats plan vs broadcast disabled, per growth dir.
  *
  * Usage: runMain graft.tools.SymdelPlanProbe <growthDir> [g ...]
  */
object SymdelPlanProbe {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft_linkage_growth")
    val gs = { val t = args.drop(1).map(_.toInt); if (t.nonEmpty) t.toSeq else Seq(5, 10) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (g <- gs; strat <- Seq("block", "symdel");
         arm <- Seq("default", "smj", "shj")) {
      arm match {
        case "default" =>
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.unset("spark.sql.join.preferSortMergeJoin")
        case "smj" =>
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.conf.unset("spark.sql.join.preferSortMergeJoin")
        case "shj" =>
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      }
      val cand = graft.operators.Hygiene
        .linkageCandidates(spark, s"$workDir/g$g", strat)
      val joins = cand.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .map(_.trim.takeWhile(_ != '(')).toSeq.distinct
      val t0 = System.nanoTime()
      val n = cand.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"linkage_plan","g":$g,"strategy":"$strat","arm":"$arm","cand":$n,"sec":$sec%.2f,"ops":${joins.mkString("[\"", "\",\"", "\"]")}}""")
    }
    spark.stop()
  }
}
