package graft.tools

import org.apache.spark.sql.SparkSession

/** Adjudication probe for the r11 bench artifact's one out-of-band mover
  * (r11 verdict, "what's wrong" item 1): the q_basket_pairs WARM-ASSET
  * first-touch doubled in the driver artifact (6.6 s in r10 → 11.2 s in
  * r11) while every other warm asset and the suite total got FASTER —
  * and +4.6 s clears the jitter doctrine's ~2 s bar, so it cannot be
  * waved off. No r11 commit touched basketItems/basketPairs or their
  * consumers (git log -S confirms), which makes this the ClustersProbe
  * shape: a cross-run artifact comparison that needs same-JVM
  * interleaved evidence, not a code hunt.
  *
  * Protocol: one quiet JVM, Bench-identical session. Per rep, in
  * interleaved order — (a) unpersist ALL shared assets, (b) time the
  * q_basket_pairs first-touch exactly as Bench's warm loop does
  * (queries("q_basket_pairs").count() with cold caches — this builds
  * basketItems + basketPairs and runs the lift/top-20 tail), (c) time a
  * CONTROL first-touch the same way (q_range_bin → eventSessions, an
  * asset whose r10→r11 warm map moved the other way, 2.6 → 2.5 s). If
  * the basket first-touch medians land back near the r10 band with the
  * control steady, the r11 artifact cell was a host window (the same
  * verdict ClustersProbe reached for q_dedup_clusters in r11); a
  * persistent ~11 s median with an unchanged plan instead says the cost
  * is real and environment-level. Static plan counts of the declared
  * query ride along for the PLANS_BASELINE diff.
  *
  * Usage: runMain graft.tools.BasketProbe [reps] [sfDir]
  */
object BasketProbe {
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

    // absorb session/codegen/scan init before any timed cell
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.SparkEntry.queries("q_basket_pairs")(spark, sfDir).count()

    val cells = Seq("q_basket_pairs", "q_range_bin")
    val times = scala.collection.mutable.Map(
      cells.map(_ -> List.empty[Double]): _*)
    for (_ <- 1 to reps; q <- cells) {
      graft.operators.TrainingData.unpersistAll()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      times(q) = (System.nanoTime() - t0) / 1e9 :: times(q)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    val body = cells.map { q =>
      f""""$q":{"median_sec":${med(times(q))}%.3f,"min_sec":${times(q).min}%.3f,"max_sec":${times(q).max}%.3f}"""
    }.mkString(",")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val c = PlanSnapshot.counts(graft.SparkEntry.queries("q_basket_pairs")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan)
    spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    println(s"""{"metric":"basket_probe","sf":"$sfDir","reps":$reps,"first_touch":{$body},"plan":{"hashEx":${c.hashEx},"singleEx":${c.singleEx},"bcast":${c.bcast},"sorts":${c.sorts},"windows":${c.windows},"scans":${c.scans},"rddScans":${c.rddScans}}}""")
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
