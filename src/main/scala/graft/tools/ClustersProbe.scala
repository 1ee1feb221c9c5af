package graft.tools

import org.apache.spark.sql.SparkSession

/** Adjudication probe for the r10 bench artifact's one min-level mover
  * (r10 verdict item 2): q_dedup_clusters' per-rep MIN rose 2.46 → 3.84 s
  * r9→r10 with no edit to its code — the only r9→r10 move that survives
  * the min filter, so it needs the interleaved-reps treatment rather
  * than a cross-run comparison. There is no alternative formulation to
  * A/B against (git shows no change), so the probe is: many interleaved
  * reps of the mover and the two r10 in-run-window controls (q_resample,
  * q_map — both med/min-diagnosed as degraded-window artifacts) in ONE
  * quiet JVM, Bench-identical warm-up of the shared nearPairs/docToks
  * assets first, plus the query's static plan counts for a diff against
  * the committed PLANS baseline. Verdict rule: if the quiet-JVM min
  * returns to the r9 band (~2.5 s) and the plan counts match the
  * baseline, the artifact move was a host window; a persistent 3.8 s
  * min with matching plans would instead point at an environment-level
  * cost change (and a plan diff at the code).
  *
  * Usage: runMain graft.tools.ClustersProbe [reps] [sfDir]
  */
object ClustersProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(7)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = Seq("q_dedup_clusters", "q_resample", "q_map")
    // Bench-identical shared-asset warm-up so rep 1 is incremental cost
    graft.Bench.warmQs.foreach(q =>
      graft.SparkEntry.queries(q)(spark, sfDir).count())
    qs.foreach(q => graft.SparkEntry.queries(q)(spark, sfDir).count())

    val times = scala.collection.mutable.Map(qs.map(_ -> List.empty[Double]): _*)
    for (_ <- 1 to reps; q <- qs) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      times(q) = (System.nanoTime() - t0) / 1e9 :: times(q)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val body = qs.map { q =>
      f""""$q":{"median_sec":${med(times(q))}%.3f,"min_sec":${times(q).min}%.3f}"""
    }.mkString(",")
    // static plan counts of the mover, for the PLANS baseline diff
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val c = PlanSnapshot.counts(graft.SparkEntry.queries("q_dedup_clusters")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan)
    spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    println(s"""{"metric":"clusters_probe","sf":"$sfDir","reps":$reps,"queries":{$body},"plan":{"hashEx":${c.hashEx},"singleEx":${c.singleEx},"bcast":${c.bcast},"sorts":${c.sorts},"windows":${c.windows},"scans":${c.scans},"rddScans":${c.rddScans}}}""")
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
