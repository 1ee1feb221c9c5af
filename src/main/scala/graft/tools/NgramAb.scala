package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.LlmPipeline

/** One-off A/B harness for q_dedup_ngram's verify-join Bloom reduction
  * (`spark.graft.ngram.verifyBloom`): times the two plans INTERLEAVED in
  * one JVM on a ScalingProbe shard corpus, so slow host-load drift hits
  * both arms equally — cross-run comparisons on this machine have measured
  * 10× swings on identical code (BASELINE.md jitter notes), which makes
  * separate-run A/B meaningless.
  *
  * The shared cached() assets (shingle arrays, prefix set) are populated
  * once up front; each timed run then pays candidates + verify, which is
  * exactly the stage the Bloom changes.
  *
  * Usage: runMain graft.tools.NgramAb [sfDir] [workDir] [factor] [reps]
  */
object NgramAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-ngram-ab"
    val factor = if (args.length > 2) args(2).toInt else 4
    val reps = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"$work/x$factor"
    ScalingProbe.buildShards(spark, sfDir, dir, factor)
    // populate the shared corpus assets + JVM warm-up (charged to neither arm)
    LlmPipeline.qDedupNgram(spark, dir).count()

    (1 to reps).foreach { rep =>
      Seq("false", "force").foreach { flag =>
        spark.conf.set("spark.graft.ngram.verifyBloom", flag)
        val t0 = System.nanoTime()
        val rows = LlmPipeline.qDedupNgram(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"rep":$rep,"bloom":$flag,"sec":$dt%.2f,"rows":$rows}""")
      }
    }
    spark.conf.unset("spark.graft.ngram.verifyBloom")
    graft.operators.TrainingData.unpersistAll()
    spark.stop()
  }
}
