package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B for the round-9 GenJoinAudit pin candidates: queries
  * whose static plan broadcasts a Generate-inflated side with no
  * accurate-stats boundary (shuffle / cache materialization / bounded
  * aggregate) between the exchange and the explode — the symdel hazard
  * shape. Arms differ ONLY in `spark.sql.autoBroadcastJoinThreshold`
  * (default vs −1), which approximates the shuffle-pinned plan for
  * queries whose only broadcast is the suspect join; the per-arm plan
  * line printed first confirms what actually changed.
  *
  * Decision rule (from the symdel episode, BASELINE r9 crossover_v3):
  * pin the hint only if the shuffle plan is not materially worse at the
  * fixture SFs AND the broadcast plan is the mis-plan at the scale the
  * lane exists for.
  *
  * Usage: runMain graft.tools.BcastAb [reps] [sfDir] [q_name ...]
  */
object BcastAb {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val names = { val t = args.drop(2); if (t.nonEmpty) t.toSeq
      else Seq("q_join_salted", "q_dedup_embed", "q_overlap_join") }
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

    def joinOps(df: DataFrame): Seq[String] =
      df.queryExecution.executedPlan.toString.linesIterator
        .map(_.dropWhile(c => c == ' ' || c == ':' || c == '+' || c == '-'))
        .map(_.replaceAll("""^\*\(\d+\) """, ""))
        .filter(l => l.startsWith("BroadcastHashJoin") ||
          l.startsWith("SortMergeJoin") || l.startsWith("ShuffledHashJoin") ||
          l.startsWith("BroadcastNestedLoopJoin"))
        .map(_.takeWhile(_ != ' ')).toSeq

    val arms = Seq("default" -> "10485760", "noBcast" -> "-1")
    for (q <- names) {
      val fn = graft.SparkEntry.queries(q)
      for ((arm, thresh) <- arms) {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        val ops = joinOps(fn(spark, sfDir))
        println(s"""{"metric":"bcast_ab_plan","q":"$q","arm":"$arm","joins":${ops.mkString("[\"", "\",\"", "\"]")}}""")
      }
      // warm both arms once, then interleave timed reps
      for ((_, thresh) <- arms) {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        fn(spark, sfDir).count()
      }
      val times = scala.collection.mutable.Map(
        arms.map { case (n, _) => n -> List.empty[Double] }: _*)
      for (_ <- 1 to reps; (arm, thresh) <- arms) {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        times(arm) = (System.nanoTime() - t0) / 1e9 :: times(arm)
      }
      def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
      val armJson = arms.map { case (n, _) =>
        f""""$n":{"median_sec":${med(times(n))}%.3f,"min_sec":${times(n).min}%.3f}"""
      }.mkString(",")
      // row-identity across arms (plans must never change answers)
      val same = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", arms(0)._2)
        val a = fn(spark, sfDir)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", arms(1)._2)
        val b = fn(spark, sfDir)
        a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      println(s"""{"metric":"bcast_ab","q":"$q","sf":"$sfDir","reps":$reps,"same_rows":$same,"arms":{$armJson}}""")
    }
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
