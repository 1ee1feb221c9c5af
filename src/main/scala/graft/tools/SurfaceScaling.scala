package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Full-surface cross-SF scaling sweep (round 8).
  *
  * ScalingProbe measures the dedup family against a synthetically grown
  * corpus; THIS measures every declared query across the real SF ladder
  * (sf0.001 → sf0.01 → sf0.1, 10× data per step) and reports the
  * per-query wall-time ratio between consecutive steps. The point is the
  * would-it-survive-100× question asked of the WHOLE surface, not just
  * the operators we already suspected: a query whose time ratio exceeds
  * the data ratio is super-linear and will not survive the next two
  * orders of magnitude; one well under it is fixed-overhead-dominated at
  * this scale (expected for most queries at local SFs).
  *
  * Protocol per SF dir: reset the shared derived caches (they are
  * per-corpus), run the Bench warm list untimed (cache population is a
  * once-per-corpus cost, reported separately), then `reps` full
  * pass-major timed passes; per-query time = min across reps (the
  * quiet-machine estimator — medians need 3+ reps, min sheds transient
  * host noise fastest at 2).
  *
  * Output: one JSON line per SF with per-query seconds, then a final
  * {"metric":"surface_scaling"} line with per-step ratio percentiles and
  * every query whose ratio exceeds `flag` (default 12 ≈ data ratio 10
  * plus noise headroom).
  *
  * Usage: runMain graft.tools.SurfaceScaling <sfDirLo> <sfDirMid> <sfDirHi>
  */
object SurfaceScaling {

  private def warmQs = graft.Bench.warmQs

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALING_REPS", "2").toInt
    val flag = sys.env.getOrElse("SPARK_GRAFT_SCALING_FLAG", "12.0").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val order = SparkEntry.queries.keys.toSeq
    // perSf(sfDir)(query) = min seconds across reps (-1 = failed all reps)
    val perSf = scala.collection.mutable.LinkedHashMap[String, Map[String, Double]]()

    for (dir <- dirs) {
      graft.operators.TrainingData.unpersistAll()
      spark.catalog.clearCache()
      val w0 = System.nanoTime()
      warmQs.foreach { q =>
        // NonFatal only: an OutOfMemoryError must abort the sweep, not be
        // recorded as a per-query failure on a possibly-corrupted JVM whose
        // subsequent timings would silently skew every scaling ratio.
        try SparkEntry.queries(q)(spark, dir).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"warm $q failed: $e") }
      }
      val warm = (System.nanoTime() - w0) / 1e9
      val times = scala.collection.mutable.Map[String, List[Double]]()
        .withDefaultValue(Nil)
      for (_ <- 1 to reps; q <- order) {
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(q)(spark, dir).count(); true }
                 catch { case scala.util.control.NonFatal(e) =>
                   System.err.println(s"$q failed: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) times(q) = dt :: times(q)
      }
      val mins = order.map(q =>
        q -> (if (times(q).nonEmpty) times(q).min else -1.0)).toMap
      perSf(dir) = mins
      val total = mins.values.filter(_ >= 0).sum
      val qjson = order.map(q => s""""$q":${mins(q)}""").mkString(",")
      println(s"""{"metric":"surface_scaling_sf","sf":"$dir","warmup_sec":$warm,"reps":$reps,"total_sec":$total,"queries":{$qjson}}""")
    }

    graft.operators.TrainingData.unpersistAll()
    spark.stop()

    // Consecutive-step ratios. Sub-noise-floor times make ratios garbage:
    // clamp the denominator at 50 ms (a 30 ms → 400 ms move is fixed-cost
    // jitter at local SFs, not a scaling signal).
    val floor = 0.05
    val steps = dirs.sliding(2).collect { case Seq(lo, hi) =>
      val ratios = order.flatMap { q =>
        val (tl, th) = (perSf(lo)(q), perSf(hi)(q))
        if (tl < 0 || th < 0) None
        else Some(q -> th / math.max(tl, floor))
      }
      val sorted = ratios.map(_._2).sorted
      def pct(p: Double) =
        if (sorted.isEmpty) 0.0
        else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))
      val flagged = ratios.filter(_._2 > flag).sortBy(-_._2)
      val fj = flagged.map { case (q, r) =>
        f""""$q":{"ratio":$r%.1f,"lo_sec":${perSf(lo)(q)}%.3f,"hi_sec":${perSf(hi)(q)}%.3f}"""
      }.mkString(",")
      s""""${lo.split('/').last}->${hi.split('/').last}":{"n":${ratios.size},"p50":${pct(0.5)},"p90":${pct(0.9)},"max":${sorted.lastOption.getOrElse(0.0)},"flagged":{$fj}}"""
    }.mkString(",")
    println(s"""{"metric":"surface_scaling","flag_ratio":$flag,"steps":{$steps}}""")
  }
}
