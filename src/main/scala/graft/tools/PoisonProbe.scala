package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.operators.TrainingData

/** One-off diagnostic: does running q_dedup_ngram (Bloom verify on) degrade
  * the NEXT query's warm run? ScalingProbe measured q_dedup_minhash ×2 warm
  * at 22–29 s (vs 1.9 s with the Bloom arm off) in three separate runs —
  * this isolates the coupling inside one JVM: baseline minhash cold/warm,
  * then ngram twice, then minhash again, persisted-RDD census and a GC
  * probe between.
  *
  * Usage: runMain graft.tools.PoisonProbe [sfDir] [workDir] [factor]
  */
object PoisonProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft-poison"
    val factor = if (args.length > 2) args(2).toInt else 2
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
    spark.range(1000).selectExpr("sum(id)").collect()

    // PREAMBLE=1 replicates ScalingProbe's ×1 stage before the ×2
    // measurements (the isolated sequence below does NOT reproduce the
    // anomaly; the full-probe sequence does — bisect what in the ×1
    // history matters)
    if (sys.env.get("PREAMBLE").contains("1")) {
      ScalingProbe.buildShards(spark, sfDir, s"$work/x1", 1)
      SparkEntry.queries("q_dedup_exact")(spark, s"$work/x1").count()
      Seq("q_dedup_ngram", "q_dedup_minhash", "q_incremental_dedup",
        "q_substring_dup").foreach { q =>
        TrainingData.unpersistAll()
        SparkEntry.queries(q)(spark, s"$work/x1").count()
        SparkEntry.queries(q)(spark, s"$work/x1").count()
        println(s"""{"preamble":"$q"}""")
      }
    }

    def t(label: String, q: String): Unit = {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val nRdds = spark.sparkContext.getPersistentRDDs.size
      println(f"""{"step":"$label","sec":$dt%.2f,"rows":$rows,"persistedRdds":$nRdds}""")
    }

    TrainingData.unpersistAll()
    t("ngram_run1", "q_dedup_ngram")
    t("ngram_run2", "q_dedup_ngram")

    TrainingData.unpersistAll()
    t("minhash_cold_after", "q_dedup_minhash")
    t("minhash_warm_after", "q_dedup_minhash")
    t("minhash_warm_after2", "q_dedup_minhash")

    System.gc()
    Thread.sleep(2000)
    t("minhash_warm_postgc", "q_dedup_minhash")

    TrainingData.unpersistAll()
    spark.stop()
  }
}
