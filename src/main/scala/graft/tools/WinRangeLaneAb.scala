package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B/C for the q_win_range lane dial (r14, the auto-default
  * decision's measured basis): plain vs auto vs bucketed on a given
  * corpus, pass-major median, v2 noop action. `auto − plain` at the
  * skew-free declared shape IS the decision-pass price the auto default
  * pays (one map-side-combined aggregate over events); `auto` on a
  * hot-user corpus should track bucketed (dispatch overhead only).
  * Results in BASELINE r14 "q_win_range auto lane".
  *
  * Usage: runMain graft.tools.WinRangeLaneAb [sfDir] [reps]
  */
object WinRangeLaneAb {

  val Arms = Seq("plain", "auto", "bucketed")

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(strategy: String): Double = {
      spark.conf.set("spark.graft.winrange.strategy", strategy)
      val t0 = System.nanoTime()
      try graft.operators.Windows.qWinRange(spark, d)
        .write.format("noop").mode("overwrite").save()
      finally spark.conf.unset("spark.graft.winrange.strategy")
      (System.nanoTime() - t0) / 1e9
    }
    Arms.foreach(run) // warm codegen + parquet readers
    val times =
      collection.mutable.Map(Arms.map(_ -> List.empty[Double]): _*)
    for (_ <- 1 to reps; a <- Arms) times(a) = run(a) :: times(a)
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val (choice, hot, total) =
      graft.operators.Windows.winRangeAutoChoice(spark, d)
    val body = Arms.map(a =>
      f""""$a":{"med":${med(times(a))}%.3f,"min":${times(a).min}%.3f}""")
      .mkString(",")
    println(s"""{"dir":"$d","auto_choice":"$choice","hot":$hot,"total":$total,$body}""")
    spark.stop()
  }
}
